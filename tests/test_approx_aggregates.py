"""Approximate aggregates (SURVEY §2.6 ledger): the HLL++ sketch merge
is commutative/associative, so approx_count_distinct is DETERMINISTIC
under any partitioning — pinnable Spark-side even though it cannot
hash-match DuckDB's different HLL implementation."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_deterministic_and_accurate(spark, events):
    exact = events.select(F.countDistinct("user_id")).first()[0]
    a = events.select(F.approx_count_distinct("user_id").alias("n")).first()["n"]
    b = (
        events.repartition(7, "event_type")
        .select(F.approx_count_distinct("user_id").alias("n"))
        .first()["n"]
    )
    assert a == b  # sketch merge is order-insensitive
    assert abs(a - exact) / exact < 0.05  # default rsd=0.05


def test_approx_percentile_deterministic(spark, events):
    a = events.select(
        F.percentile_approx("value", [0.5, 0.9], 10_000).alias("q")
    ).first()["q"]
    b = (
        events.repartition(5, "user_id")
        .select(F.percentile_approx("value", [0.5, 0.9], 10_000).alias("q"))
        .first()["q"]
    )
    assert a == b
    # sanity: within the exact quantiles' neighborhood
    med = events.select(F.median("value")).first()[0]
    assert abs(a[0] - med) <= abs(med) * 0.05 + 1.0
