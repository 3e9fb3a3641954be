"""As-of join semantics: latest at-or-before match, tie rule, left mode."""

from __future__ import annotations

import datetime as dt

from lawlm_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (1, 20, _ts(20)), (2, 30, _ts(5))],
        "user_id long, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 100, _ts(9)), (1, 200, _ts(10)), (1, 300, _ts(15)), (2, 400, _ts(6))],
        "user_id long, rid long, ts timestamp",
    )
    got = {
        (r["user_id"], r["lid"]): r["rid"]
        for r in asof_join(left, right, "user_id", "ts", ["rid"]).collect()
    }
    assert got[(1, 10)] == 200  # equal timestamp matches (>= tie rule)
    assert got[(1, 20)] == 300  # latest at-or-before, not first
    assert (2, 30) not in got  # inner: no right row at-or-before ts=5


def test_asof_join_null_right_value(spark):
    """ADVICE r2: a matched right row whose value column is NULL must
    still match (and must NOT fall back to an older right row)."""
    left = spark.createDataFrame(
        [(1, 10, _ts(20))], "user_id long, lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 100, _ts(5)), (1, None, _ts(15))],
        "user_id long, rid long, ts timestamp",
    )
    rows = asof_join(left, right, "user_id", "ts", ["rid"]).collect()
    # inner keeps the row (a right row exists at ts=15) and its rid is the
    # matched row's NULL — not the older 100
    assert len(rows) == 1 and rows[0]["rid"] is None


def test_asof_join_left_mode(spark):
    left = spark.createDataFrame([(2, 30, _ts(5))], "user_id long, lid long, ts timestamp")
    right = spark.createDataFrame([(2, 400, _ts(6))], "user_id long, rid long, ts timestamp")
    rows = asof_join(left, right, "user_id", "ts", ["rid"], how="left").collect()
    assert len(rows) == 1 and rows[0]["rid"] is None


def test_forward_asof_matches_next_reading(spark):
    from lawlm_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 1, "x")], "k long, ts long, v string"
    )
    out = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(left, right, "k", "ts", ["v"], direction="forward").collect()
    }
    # ts=10 matches the equal-ts right row (ties go to right), ts=25 the
    # NEXT row (30/'b'); ts=40 has no following row -> dropped (inner);
    # user 2 at ts=5 has no row at/after 5 -> dropped
    assert out == {(1, 10): "a", (1, 25): "b"}


def test_forward_asof_left_keeps_unmatched(spark):
    from lawlm_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 40)], "k long, ts long")
    right = spark.createDataFrame([(1, 30, "b")], "k long, ts long, v string")
    out = asof_join(left, right, "k", "ts", ["v"], how="left", direction="forward").collect()
    assert len(out) == 1 and out[0]["v"] is None


def test_bad_direction_rejected(spark):
    import pytest

    from lawlm_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, "k", "ts", [], direction="sideways")


def test_asof_tolerance_nulls_stale_matches(spark):
    from lawlm_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 5000, "p2"), (2, 50, "p3")],
        "k long, t long, pid string",
    )
    right = spark.createDataFrame(
        [(1, 90, "fresh"), (1, 200, "stale-for-p2"), (2, 10, "old")],
        "k long, t long, v string",
    )
    # tolerance 100: p1 matches (delta 10), p2's best match is at 200
    # (delta 4800 -> nulled), p3's at 10 (delta 40 -> kept)
    out = {
        r["pid"]: r["v"]
        for r in asof_join(
            left, right, "k", "t", ["v"], how="left", tolerance=100
        ).collect()
    }
    assert out == {"p1": "fresh", "p2": None, "p3": "old"}
    # inner drops the stale row entirely
    inner = asof_join(left, right, "k", "t", ["v"], how="inner", tolerance=100)
    assert {r["pid"] for r in inner.collect()} == {"p1", "p3"}


def test_asof_tolerance_wide_equals_none(spark):
    from lawlm_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, i * 10, f"l{i}") for i in range(10)], "k long, t long, pid string"
    )
    right = spark.createDataFrame(
        [(1, i * 7, f"r{i}") for i in range(10)], "k long, t long, v string"
    )
    base = sorted(map(tuple, asof_join(left, right, "k", "t", ["v"]).collect()))
    wide = sorted(
        map(tuple, asof_join(left, right, "k", "t", ["v"], tolerance=10**9).collect())
    )
    assert base == wide
