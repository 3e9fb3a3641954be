"""operators/timeseries.py: grid resample + forward fill."""

from __future__ import annotations

import datetime

from lawlm_spark.operators.timeseries import resample_ffill

H = 3_600_000_000  # 1h in micros
T0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (
                u,
                datetime.datetime.fromtimestamp(
                    (T0 + dt_us) / 1e6, tz=datetime.timezone.utc
                ),
                v,
                i,
            )
            for i, (u, dt_us, v) in enumerate(rows)
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )


def test_gaps_filled_with_previous_value(spark):
    rows = [
        (1, 0, 10.0),          # hour 0
        (1, 3 * H + 5, 30.0),  # hour 3 — hours 1,2 are gaps
    ]
    out = {
        r["bucket_us"]: (r["value"], r["observed"])
        for r in resample_ffill(_ev(spark, rows)).collect()
    }
    assert out[T0] == (10.0, True)
    assert out[T0 + H] == (10.0, False)
    assert out[T0 + 2 * H] == (10.0, False)
    assert out[T0 + 3 * H] == (30.0, True)
    assert len(out) == 4  # grid ends at the last observation


def test_last_observation_per_bucket_wins_with_tiebreak(spark):
    rows = [
        (1, 10, 1.0),
        (1, 20, 2.0),  # later in the same bucket -> wins
        (2, 30, 5.0),
        (2, 30, 6.0),  # same ts: higher event_id wins
    ]
    out = {
        (r["user_id"], r["bucket_us"]): r["value"]
        for r in resample_ffill(_ev(spark, rows)).collect()
    }
    assert out[(1, T0)] == 2.0
    assert out[(2, T0)] == 6.0


def test_keys_do_not_leak_values(spark):
    rows = [(1, 0, 1.0), (2, 2 * H, 9.0)]
    out = resample_ffill(_ev(spark, rows)).collect()
    # user 2's grid starts at ITS first bucket — no rows borrowed from user 1
    assert {(r["user_id"], r["bucket_us"]) for r in out} == {(1, T0), (2, T0 + 2 * H)}
