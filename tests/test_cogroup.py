"""Cogrouped applyInPandas conversion lags (operators/cogroup.py)."""

from __future__ import annotations

import datetime


def _t(m):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def test_conversion_lags_asof_and_ties(spark):
    from lawlm_spark.operators.cogroup import conversion_lags

    clicks = spark.createDataFrame(
        [
            (1, 100, _t(0)), (1, 101, _t(5)),
            # tie: two clicks at the same instant -> max click_id wins
            (2, 200, _t(10)), (2, 201, _t(10)),
            (3, 300, _t(50)),  # after user 3's purchase -> no match
        ],
        "user_id long, event_id long, ts timestamp",
    )
    purchases = spark.createDataFrame(
        [(1, 900, _t(7)), (2, 901, _t(10)), (3, 902, _t(40)), (4, 903, _t(1))],
        "user_id long, event_id long, ts timestamp",
    )
    got = {
        r["purchase_id"]: (r["click_id"], r["lag_us"])
        for r in conversion_lags(clicks, purchases).collect()
    }
    assert got == {
        900: (101, 2 * 60 * 1_000_000),  # most recent prior click
        901: (201, 0),                   # tie -> highest click id
        # 902: user 3's only click is later -> dropped
        # 903: user 4 has no clicks -> dropped
    }
