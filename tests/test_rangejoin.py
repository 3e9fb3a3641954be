"""Bucketized range join equals the naive theta join."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.rangejoin import range_join
from lawlm_spark.sources.testdata import load_table


def test_range_join_equals_naive(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    intervals = ev.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("interval_id"),
        F.date_trunc("hour", F.col("ts")).alias("start_ts"),
        (F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
    )
    points = ev.filter("event_type = 'click'").select("user_id", "ts", "event_id")

    bucketized = range_join(points, intervals, "user_id", "ts", "start_ts", "end_ts")
    naive = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.user_id") == F.col("i.user_id"))
        & (F.col("p.ts") >= F.col("i.start_ts"))
        & (F.col("p.ts") < F.col("i.end_ts")),
    )
    got = sorted((r["event_id"], r["interval_id"]) for r in bucketized.collect())
    want = sorted((r["event_id"], r["interval_id"]) for r in naive.collect())
    assert got == want and got  # same pairs, and the data produces matches


def test_range_join_boundaries(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    intervals = spark.createDataFrame(
        [(1, 100, t0, t0 + dt.timedelta(hours=1))],
        "user_id long, interval_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, 10, t0),  # == start -> included
            (1, 11, t0 + dt.timedelta(hours=1)),  # == end -> excluded (half-open)
            (1, 12, t0 + dt.timedelta(minutes=30)),
            (2, 13, t0 + dt.timedelta(minutes=30)),  # wrong key
        ],
        "user_id long, event_id long, ts timestamp",
    )
    got = sorted(
        r["event_id"]
        for r in range_join(points, intervals, "user_id", "ts", "start_ts", "end_ts").collect()
    )
    assert got == [10, 12]
