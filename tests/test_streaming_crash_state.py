"""Kill-and-restart coverage for the two streaming state machines that
lacked it (VERDICT r6 item 6): v38's stream-stream LEFT OUTER join
(buffered unmatched rows in join state) and v41's
applyInPandasWithState sessions (trailing session + event-time
timeout in user state).

Protocol: the query runs availableNow with maxFilesPerTrigger=1 over a
landing dir whose file mtimes pin batch order, sinking through an
IDEMPOTENT foreachBatch (overwrite-by-batch-id parquet dirs — the
standard replay-safe sink shape).  A one-shot marker-file kill raises
inside the chosen micro-batch BEFORE its sink write, so the query dies
with that batch's offsets un-committed and its state un-persisted to
the sink.  The restart (same checkpoint) must replay the batch from
the state store and finish such that the persisted union is EXACTLY
the uncrashed reference — any lost join-state/session-state row or
double emission fails the multiset comparison.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid as uuidlib

import pytest
from pyspark.sql import functions as F

from lawlm_spark.streaming.stateful import stateful_sessions

T0 = 1_609_459_200_000_000  # 2021-01-01 00:00:00 UTC, epoch micros
MIN = 60_000_000
HOUR = 3_600_000_000


def _land(spark, landing: str, parts: list) -> None:
    """Write each part as one parquet file with increasing mtime so the
    file source's batch order is pinned (the v41 runner's pattern)."""
    os.makedirs(landing, exist_ok=True)
    t0 = 1_600_000_000
    for i, part in enumerate(parts):
        stage = os.path.join(landing, f"_stage{i}")
        part.coalesce(1).write.parquet(stage)
        f = next(x for x in os.listdir(stage) if x.endswith(".parquet"))
        dst = os.path.join(landing, f"part{i}.parquet")
        shutil.move(os.path.join(stage, f), dst)
        shutil.rmtree(stage)
        os.utime(dst, (t0 + i * 60, t0 + i * 60))


def _make_sink(out_dir: str, kill_marker: str | None, kill_batch: int | None):
    def _sink(df, batch_id: int) -> None:
        if (
            kill_marker is not None
            and batch_id == kill_batch
            and not os.path.exists(kill_marker)
        ):
            open(kill_marker, "w").close()
            raise RuntimeError("injected kill")
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"b{batch_id}"))

    return _sink


def _collect_sink(spark, out_dir: str):
    dfs = [
        spark.read.parquet(os.path.join(out_dir, d))
        for d in sorted(os.listdir(out_dir))
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _run(stream_df, ckpt: str, out_dir: str, kill_marker=None, kill_batch=None):
    q = (
        stream_df.writeStream.foreachBatch(_make_sink(out_dir, kill_marker, kill_batch))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# v38: stream-stream LEFT OUTER interval join


def _v38_stream(spark, landing: str):
    schema = "user_id long, event_type string, ts_us long"
    base = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(landing)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts_us").alias("click_us"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts_us").alias("purchase_us"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        "left_outer",
    ).select(
        F.col("p_user_id").alias("uid"),
        "purchase_us",
        F.col("click_us"),
    )


def _v38_rows(spark, out_dir: str, max_real_us: int):
    return sorted(
        (r["uid"], r["purchase_us"], r["click_us"])
        for r in _collect_sink(spark, out_dir)
        .filter(F.col("purchase_us") <= max_real_us)
        .collect()
    )


def test_v38_outer_join_state_survives_kill_restart(spark):
    base = tempfile.mkdtemp(prefix="v38_crash_")
    landing = os.path.join(base, "landing")
    max_real = T0 + 90 * MIN
    sentinel = max_real + 2 * HOUR + 1_000_000
    clicks = spark.createDataFrame(
        [(1, "click", T0), (3, "click", T0)],
        "user_id long, event_type string, ts_us long",
    )
    purchases = spark.createDataFrame(
        [
            (1, "purchase", T0 + 30 * MIN),  # matches u1's click
            (2, "purchase", T0 + 40 * MIN),  # no click at all -> null row
            (3, "purchase", T0 + 90 * MIN),  # click outside horizon -> null row
        ],
        "user_id long, event_type string, ts_us long",
    )
    sentinels = spark.createDataFrame(
        [(-1, "click", sentinel), (-2, "purchase", sentinel)],
        "user_id long, event_type string, ts_us long",
    )
    _land(spark, landing, [clicks, purchases, sentinels])

    expected = [
        (1, T0 + 30 * MIN, T0),
        (2, T0 + 40 * MIN, None),
        (3, T0 + 90 * MIN, None),
    ]

    # reference: uncrashed run
    ref_out = os.path.join(base, "ref_out")
    _run(_v38_stream(spark, landing), os.path.join(base, "ref_ckpt"), ref_out)
    assert _v38_rows(spark, ref_out, max_real) == expected

    # crashed run: kill during the purchases batch (click state buffered),
    # then restart with the SAME checkpoint
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    marker = os.path.join(base, "killed")
    with pytest.raises(Exception, match="injected kill"):
        _run(_v38_stream(spark, landing), ckpt, out, marker, kill_batch=1)
    assert os.path.exists(marker)
    _run(_v38_stream(spark, landing), ckpt, out, marker, kill_batch=1)

    # no lost buffered click, no lost unmatched purchase, no double emission
    assert _v38_rows(spark, out, max_real) == expected


# ---------------------------------------------------------------------------
# v41: applyInPandasWithState sessions with EventTimeTimeout


def _v41_stream(spark, landing: str, gap_us: int = HOUR):
    schema = "user_id long, ts_us long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(landing)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "0 seconds")
    )
    return stateful_sessions(stream.select("user_id", "ts", "ts_us"), gap_us)


def _v41_rows(spark, out_dir: str, max_real_us: int):
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in _collect_sink(spark, out_dir)
        .filter(F.col("session_start") <= max_real_us)
        .collect()
    )


def test_v41_timeout_state_survives_kill_restart(spark):
    base = tempfile.mkdtemp(prefix="v41_crash_")
    landing = os.path.join(base, "landing")
    max_real = T0 + 3 * HOUR + 5 * MIN
    sentinel = max_real + 2 * HOUR + 1_000_000
    # u1's second session and u2's lone event arrive in batch 1: the kill
    # lands exactly while u1's open session [T0+3h] sits in state
    f0 = spark.createDataFrame(
        [(1, T0), (1, T0 + 10 * MIN), (1, T0 + 3 * HOUR)],
        "user_id long, ts_us long",
    )
    f1 = spark.createDataFrame(
        [(1, T0 + 3 * HOUR + 5 * MIN), (2, T0 + 20 * MIN)],
        "user_id long, ts_us long",
    )
    f2 = spark.createDataFrame([(-1, sentinel)], "user_id long, ts_us long")
    _land(spark, landing, [f0, f1, f2])

    expected = [
        (1, T0, T0 + 10 * MIN, 2),
        (1, T0 + 3 * HOUR, T0 + 3 * HOUR + 5 * MIN, 2),  # straddles the kill
        (2, T0 + 20 * MIN, T0 + 20 * MIN, 1),  # flushed by timeout only
    ]

    ref_out = os.path.join(base, "ref_out")
    _run(_v41_stream(spark, landing), os.path.join(base, "ref_ckpt"), ref_out)
    assert _v41_rows(spark, ref_out, max_real) == expected

    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    marker = os.path.join(base, "killed")
    with pytest.raises(Exception, match="injected kill"):
        _run(_v41_stream(spark, landing), ckpt, out, marker, kill_batch=1)
    assert os.path.exists(marker)
    _run(_v41_stream(spark, landing), ckpt, out, marker, kill_batch=1)

    # the replayed batch folded into the RESTORED state: the straddling
    # session is one row (not split, not doubled) and the timeout still
    # fired for the idle key
    assert _v41_rows(spark, out, max_real) == expected


def test_v41_late_expired_session_drains_without_watermark_advance(spark):
    """ADVICE r7: a late event older than the watermark whose session is
    ALREADY expired (end + gap <= watermark) must be emitted in the same
    run even when nothing afterwards advances the watermark — the old
    clamp parked it in state behind a wm+1 timeout that never fires
    under availableNow when the late event lands in the final
    micro-batch."""
    base = tempfile.mkdtemp(prefix="v41_late_")
    landing = os.path.join(base, "landing")
    # batch 0 pushes the watermark to T0+10h; batch 1 (the FINAL batch)
    # carries only a late event at T0 — no sentinel afterwards
    f0 = spark.createDataFrame(
        [(1, T0), (9, T0 + 10 * HOUR)], "user_id long, ts_us long"
    )
    f1 = spark.createDataFrame([(2, T0)], "user_id long, ts_us long")
    _land(spark, landing, [f0, f1])

    out = os.path.join(base, "out")
    _run(_v41_stream(spark, landing), os.path.join(base, "ckpt"), out)

    # u1 flushes by timeout in batch 1 (wm passed T0+1h); u2's late
    # already-expired session flushes on the DATA PATH in batch 1.
    # u9's open session (end+gap > wm) correctly stays in state and is
    # excluded by the start-time filter.
    assert _v41_rows(spark, out, T0) == [
        (1, T0, T0, 1),
        (2, T0, T0, 1),
    ]


# ---------------------------------------------------------------------------
# v46: dropDuplicatesWithinWatermark (bounded-state dedup)


def _v46_stream(spark, landing: str):
    schema = "event_id long, user_id long, ts_us long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(landing)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    return (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id")
    )


def test_v46_dedup_state_survives_kill_restart(spark):
    """Beyond the verdict's v38/v41 parity ask: the dedup-state store
    must also survive a mid-batch kill — a batch-1 duplicate of a
    batch-0 event may only be suppressed if the seen-keys state was
    restored, and the batch-0 emission must not repeat."""
    base = tempfile.mkdtemp(prefix="v46_crash_")
    landing = os.path.join(base, "landing")
    f0 = spark.createDataFrame(
        [(1, 10, T0), (2, 20, T0 + MIN)], "event_id long, user_id long, ts_us long"
    )
    # batch 1: a duplicate of event 1 (within the watermark delay) + new event 3
    f1 = spark.createDataFrame(
        [(1, 10, T0 + 2 * MIN), (3, 30, T0 + 3 * MIN)],
        "event_id long, user_id long, ts_us long",
    )
    _land(spark, landing, [f0, f1])

    expected = [(1, 10), (2, 20), (3, 30)]

    def rows(out_dir):
        return sorted(
            (r["event_id"], r["user_id"])
            for r in _collect_sink(spark, out_dir).collect()
        )

    ref_out = os.path.join(base, "ref_out")
    _run(_v46_stream(spark, landing), os.path.join(base, "ref_ckpt"), ref_out)
    assert rows(ref_out) == expected

    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    marker = os.path.join(base, "killed")
    with pytest.raises(Exception, match="injected kill"):
        _run(_v46_stream(spark, landing), ckpt, out, marker, kill_batch=1)
    assert os.path.exists(marker)
    _run(_v46_stream(spark, landing), ckpt, out, marker, kill_batch=1)

    # duplicate suppressed by RESTORED state; no double emission of batch 0
    assert rows(out) == expected
