"""V14: Structured Streaming batch/stream parity."""

from __future__ import annotations

from lawlm_spark.streaming.events import (
    run_streaming_window_counts,
    sliding_window_counts,
    tumbling_window_counts,
)


def test_stream_equals_batch(spark, events):
    stream = run_streaming_window_counts(spark, "/root/testdata/sf0.001")
    batch = tumbling_window_counts(events)
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_sliding_double_counts(spark, events):
    tumbling = tumbling_window_counts(events)
    sliding = sliding_window_counts(events, width="2 days", slide="1 day")
    n_t = sum(r["n"] for r in tumbling.collect())
    n_s = sum(r["n"] for r in sliding.collect())
    assert n_s == 2 * n_t  # each event lands in exactly width/slide windows


def test_streaming_sessions_equal_batch(spark, events):
    """Append-mode session windows flush EVERY session (incl. the one
    holding max event time) thanks to the sentinel punctuation event;
    without it the final session never passes the watermark."""
    from lawlm_spark.streaming.events import (
        run_streaming_session_counts,
        session_window_counts,
    )

    stream = run_streaming_session_counts(spark, "/root/testdata/sf0.001")
    batch = session_window_counts(events)
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0
    assert stream.filter("user_id = -1").count() == 0  # sentinel filtered


def test_interval_micros_parser():
    """The v34 sentinel offset is DERIVED from the gap string (ADVICE r4:
    no second parameter to desync)."""
    import pytest

    from lawlm_spark.streaming.events import _interval_micros

    assert _interval_micros("1 hour") == 3_600_000_000
    assert _interval_micros("30 minutes") == 1_800_000_000
    assert _interval_micros("45 seconds") == 45_000_000
    assert _interval_micros("2 days") == 172_800_000_000
    with pytest.raises(ValueError):
        _interval_micros("fortnight")
    with pytest.raises(ValueError):
        _interval_micros("3 lightyears")
