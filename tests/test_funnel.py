"""operators/funnel.py: ordered-funnel semantics."""

from __future__ import annotations

import datetime

import pytest

from lawlm_spark.operators.funnel import funnel_counts, funnel_times


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, datetime.datetime(2024, 1, 1, 0, 0, s, tzinfo=datetime.timezone.utc), t)
            for u, s, t in rows
        ],
        "user_id long, ts timestamp, event_type string",
    )


US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros


def test_first_completion_and_order_requirement(spark):
    rows = [
        # user 1: full funnel in order
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # user 2: purchase BEFORE click -> funnel stalls at click
        (2, 1, "view"), (2, 2, "purchase"), (2, 3, "click"),
        # user 3: click only, never viewed -> not in output at all
        (3, 1, "click"),
        # user 4: view twice; first one counts
        (4, 5, "view"), (4, 2, "view"), (4, 6, "click"),
    ]
    out = {
        r["user_id"]: r
        for r in funnel_times(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1]["stages_completed"] == 3
    assert out[1]["t_purchase_us"] == US + 3_000_000
    assert out[2]["stages_completed"] == 2  # click found (s=3) but no purchase after
    assert out[2]["t_purchase_us"] is None
    assert out[4]["t_view_us"] == US + 2_000_000  # earliest view, not first listed


def test_same_timestamp_tie_never_advances(spark):
    # click at the SAME instant as view: strict > excludes it
    rows = [(1, 1, "view"), (1, 1, "click"), (1, 2, "click")]
    out = funnel_times(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert out["t_click_us"] == US + 2_000_000


def test_funnel_counts_monotone(spark, events):
    from lawlm_spark.streaming.events import normalize_event_time

    ev = normalize_event_time(events)
    got = {
        r["stage_index"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got[1] >= got[2] >= got[3] > 0


def test_empty_stages_rejected(spark):
    with pytest.raises(ValueError, match="at least one"):
        funnel_times(_ev(spark, [(1, 1, "view")]), [])
