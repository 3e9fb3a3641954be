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


def test_streaming_session_sequences_equal_batch(spark, events):
    """The r18 sequence runner (v86): the streamed per-session
    event-type sequences equal a batch session_window aggregation of
    the same corpus, in exact ts/event_id order, and the sentinel's
    session is filtered."""
    from pyspark.sql import functions as F

    from lawlm_spark.streaming.events import run_streaming_session_sequences

    stream = run_streaming_session_sequences(spark, "/root/testdata/sf0.001")
    batch = (
        events.groupBy(
            F.session_window(F.col("ts"), "1 hour").alias("w"), "user_id"
        )
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("_ev")
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.transform(F.col("_ev"), lambda e: e["event_type"]).alias("seq"),
        )
    )
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0
    assert stream.filter("user_id = -1").count() == 0


def test_session_bigram_topk_counts_ordered_adjacency(spark):
    """Hand-checked adjacency semantics: counts ONLY immediate ordered
    (a,b) steps — reversed order and gapped pairs do not count;
    overlapping occurrences each count; pattern-free sessions drop."""
    import datetime

    from lawlm_spark.streaming.events import session_bigram_topk

    t0 = datetime.datetime(2024, 1, 1)
    sessions = spark.createDataFrame(
        [
            (1, t0, ["view", "click", "view", "click", "purchase"]),
            (2, t0, ["click", "view", "purchase"]),  # reversed + gapped
            (3, t0, ["view", "view", "click"]),
        ],
        "user_id long, session_start timestamp, seq array<string>",
    )
    pat = spark.createDataFrame(
        [(0, "view", "click"), (1, "click", "purchase"), (2, "error", "view")],
        "query_id long, a string, b string",
    )
    out = session_bigram_topk(sessions, pat, k=10)
    got = sorted(
        (r["query_id"], r["user_id"], r["n_adjacent"], r["rn"])
        for r in out.collect()
    )
    assert got == [
        (0, 1, 2, 1),  # two view->click steps
        (0, 3, 1, 2),  # the view,view,click tail counts once
        (1, 1, 1, 1),  # click->purchase
    ]
