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
