"""Batch LLM operator + bucketed mirror layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.functions.llm import fake_llm_summary, summarize_batch
from lawlm_spark.sources.mirror import write_mirror_bucketed


def test_summarize_batch_matches_column_fake(spark, docs):
    d = docs.limit(8).select("doc_id", F.col("text").alias("prompt"))
    via_udf = summarize_batch(d, "prompt", "s1")
    via_expr = d.select("doc_id", fake_llm_summary(F.col("prompt")).alias("s2"))
    rows = via_udf.join(via_expr, "doc_id").collect()
    assert rows and all(r["s1"] == r["s2"] for r in rows)


def test_partitioned_mirror_prunes(spark, docs, tmp_path):
    """Partition pruning: a filter on the partition column reaches the
    scan as PartitionFilters, not a post-scan Filter."""
    from lawlm_spark.sources.mirror import scan_mirror, write_mirror

    path = str(tmp_path / "part_mirror")
    write_mirror(docs.select("doc_id", "text", "source"), path, partition_by=("source",))
    scan = scan_mirror(spark, path).filter(F.col("source") == "src1")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan
    assert scan.count() == docs.filter("source = 'src1'").count()


def test_bucketed_join_has_no_shuffle(spark, docs):
    """Both sides bucketed on the join key => no Exchange in the plan."""
    left = docs.select("doc_id", "text")
    right = docs.select("doc_id", "n_chars")
    write_mirror_bucketed(left, "t_bucketed_left", "doc_id", 8)
    write_mirror_bucketed(right, "t_bucketed_right", "doc_id", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle-family join
    try:
        joined = spark.table("t_bucketed_left").join(spark.table("t_bucketed_right"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located buckets, no shuffle
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
