"""Edit-distance fuzzy matching (operators/fuzzy.py)."""

from __future__ import annotations

from lawlm_spark.operators.fuzzy import fuzzy_key_pairs


def test_fuzzy_pairs_blocking_and_threshold(spark):
    rows = [
        (1, "the quick brown fox", "en"),
        (2, "the quick brown fux", "en"),   # 1 edit from doc 1
        (3, "the quick brown fox", "de"),   # identical key, other block
        (4, "completely different", "en"),  # same block? no (prefix differs)
        (5, "the quick red panda", "en"),   # same 8-char block, 9 edits
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string, lang string")
    import pyspark.sql.functions as F

    df = df.withColumn("blk", F.substring("key", 1, 8))
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_key_pairs(df, "doc_id", "key", ["lang", "blk"], 5).collect()
    }
    assert got == {(1, 2): 1}  # cross-block identical pair excluded


def test_fuzzy_cap_block_bounds_hot_blocks(spark):
    rows = [(i, "same key text", "en") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, key string, lang string")
    out = fuzzy_key_pairs(df, "doc_id", "key", ["lang"], 5, cap_block=10)
    # capped block: only the 10 lowest ids pair -> C(10,2) = 45 pairs
    assert out.count() == 45
