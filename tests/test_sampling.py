"""Seed-pinned sampling determinism (closes the SURVEY §2.6 ledger item:
sampling is documented non-oracle-able — DuckDB's RNG differs — so the
guarantee we CAN pin is Spark-side: same seed + same input partitioning
=> identical sample, across repeated executions and the SQL surface)."""

from __future__ import annotations


def test_sample_seed_determinism(spark, docs):
    a = docs.sample(fraction=0.2, seed=42)
    b = docs.sample(fraction=0.2, seed=42)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert ids_a == ids_b and len(ids_a) > 0
    # re-execution of the same plan object is also stable
    assert sorted(r["doc_id"] for r in a.collect()) == ids_a


def test_sample_different_seeds_differ(spark, docs):
    a = {r["doc_id"] for r in docs.sample(fraction=0.2, seed=1).collect()}
    b = {r["doc_id"] for r in docs.sample(fraction=0.2, seed=2).collect()}
    assert a != b  # overwhelmingly likely on 500 docs


def test_tablesample_sql_matches_dataframe_sample(spark, docs):
    docs.createOrReplaceTempView("_sample_docs")
    sql = spark.sql(
        "SELECT doc_id FROM _sample_docs TABLESAMPLE (20 PERCENT) REPEATABLE (42)"
    )
    df = docs.sample(fraction=0.2, seed=42).select("doc_id")
    assert sorted(r["doc_id"] for r in sql.collect()) == sorted(
        r["doc_id"] for r in df.collect()
    )
