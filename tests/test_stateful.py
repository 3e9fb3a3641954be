"""applyInPandasWithState: state persists across micro-batches and the
final totals equal the batch aggregate."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from lawlm_spark.streaming.stateful import stateful_running_totals


def test_stateful_running_totals_across_batches(spark, events):
    src = tempfile.mkdtemp(prefix="stateful_src_")
    sub = events.filter("user_id < 5").select("user_id", "value", "event_id")
    # two files => two micro-batches with maxFilesPerTrigger=1
    a = sub.filter("event_id % 2 = 0")
    b = sub.filter("event_id % 2 = 1")
    a.coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    b.coalesce(1).write.mode("overwrite").parquet(src + "/f2")

    schema = sub.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = stateful_running_totals(stream, "user_id")
    sink = f"stateful_sink_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_stateful_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.table(sink).collect()
    assert rows
    # state persisted across batches: at least one key updated twice
    assert max(r["n_updates"] for r in rows) >= 2
    # final totals (last update per key) == plain batch aggregate
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["n_updates"] > final[r["user_id"]]["n_updates"]:
            final[r["user_id"]] = r
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in sub.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {k: (v["n_events"], round(v["total_value"], 6)) for k, v in final.items()}
    assert got == expected


def test_timeout_sessions_crafted_corpus(spark, tmp_path):
    """Cross-batch session merge + timeout-path flush on a corpus with
    known sessions.  User 7's two bursts straddle the median split, so
    its first session closes via the DATA path in batch 2; user 9 has
    events ONLY before the split — its session can only ever emit via
    the EventTimeTimeout path."""
    import datetime

    from pyspark.sql import functions as F

    from lawlm_spark.streaming.stateful import run_stateful_timeout_sessions

    def t(minute):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minute)

    rows = [
        # user 7 session 1: 0-10 min; session 2 (post-split): 200-205
        (7, t(0)), (7, t(10)), (7, t(200)), (7, t(205)),
        # user 9: one early session only -> timeout-path emission
        (9, t(1)), (9, t(2)),
        # user 8: post-split only
        (8, t(201)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    sf_dir = str(tmp_path / "sf")
    import os

    os.makedirs(sf_dir)
    df.coalesce(1).write.parquet(str(tmp_path / "_w"))
    import shutil

    part = next(f for f in os.listdir(str(tmp_path / "_w")) if f.endswith(".parquet"))
    shutil.move(str(tmp_path / "_w" / part), os.path.join(sf_dir, "events.parquet"))

    out = run_stateful_timeout_sessions(spark, sf_dir, gap="1 hour")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out.collect()
    )

    def us(minute):
        return int(t(minute).replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)

    assert got == [
        (7, us(0), us(10), 2),
        (7, us(200), us(205), 2),
        (8, us(201), us(201), 1),
        (9, us(1), us(2), 2),
    ]


def test_stateful_timeout_plan(spark):
    """Plan audit for the v41 state machine (VERDICT r6 item 3): the
    physical plan is ONE keyed exchange (REQUIRED_BY_STATEFUL_OPERATOR,
    hashpartitioning on the group key) feeding
    FlatMapGroupsInPandasWithState under EventTimeTimeout, with the
    event-time watermark in place — per micro-batch the corpus moves
    once, state is partitioned by key, and expiry is watermark-driven,
    not a full state scan."""
    from pyspark.sql import functions as F

    from lawlm_spark.streaming.stateful import stateful_sessions

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 3).cast("string").alias("user_id"),
            (F.col("value") * 1_000_000).alias("ts_us"),
        )
        .withWatermark("ts", "1 minute")
    )
    sdf = stateful_sessions(stream, gap_us=3_600_000_000)
    plan = sdf._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "FlatMapGroupsInPandasWithState" in plan
    assert "EventTimeTimeout" in plan
    assert "EventTimeWatermark" in plan
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(ex) == 1 and "hashpartitioning(user_id" in ex[0], plan
    assert "REQUIRED_BY_STATEFUL_OPERATOR" in ex[0]


def test_landing_build_file_order_contract(spark):
    """The r9 concurrent landing writes rely on ONE invariant for
    micro-batch ordering: exactly three single-file parts exist and
    their mtimes are strictly increasing in part index order (the
    stream's maxFilesPerTrigger=1 + latestFirst=false consume by mod
    time).  Pin it — a refactor that lets write-completion order leak
    into the stamps breaks batch order silently."""
    import os

    from lawlm_spark.streaming.events import _interval_micros
    from lawlm_spark.streaming.stateful import build_v41_landing

    landing, max_us = build_v41_landing(
        spark, "/root/testdata/sf0.001", _interval_micros("1 hour")
    )
    files = sorted(f for f in os.listdir(landing) if f.endswith(".parquet"))
    assert files == ["part0.parquet", "part1.parquet", "part2.parquet"]
    mtimes = [os.path.getmtime(os.path.join(landing, f)) for f in files]
    assert mtimes[0] < mtimes[1] < mtimes[2]
    # the sentinel (part2) must carry the watermark-advancing timestamp
    sent = spark.read.parquet(os.path.join(landing, "part2.parquet")).collect()
    assert len(sent) == 1 and sent[0]["ts_us"] > max_us


def test_landing_writer_refuses_nonempty_dir(spark, tmp_path):
    """A second write into a populated landing dir would stamp mtimes
    overlapping the existing parts and silently break micro-batch order
    (ADVICE r10) — the writer must fail loudly instead."""
    import pytest

    from lawlm_spark.streaming.landing import write_mtime_pinned_parts

    landing = str(tmp_path / "landing")
    part = spark.createDataFrame([(1, 2)], "a long, b long")
    write_mtime_pinned_parts(landing, [part])
    with pytest.raises(ValueError, match="not empty"):
        write_mtime_pinned_parts(landing, [part])


def test_conf_get_none_default_detects_unset(spark):
    """run_v41_query's Arrow-override restore branches on
    `conf.get(key, None) is None` to decide unset-vs-set.  ADVICE r9
    flagged the opposite semantics (explicit None default losing to the
    SQLConf built-in '10000') as a hazard; empirically on PySpark 4.1.2
    the explicit default WINS, so the unset branch is live.  Pin that —
    a Spark upgrade that flips it would make restore silently pin the
    built-in default into sessions that never set the key."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        if old is not None:
            spark.conf.unset(key)
        assert spark.conf.get(key, None) is None  # unset -> None, not '10000'
        spark.conf.set(key, 4321)
        assert spark.conf.get(key, None) == "4321"
        spark.conf.unset(key)
        assert spark.conf.get(key, None) is None  # unset is restorable
    finally:
        # restore BOTH directions: if the conf started unset and an
        # assertion fired after conf.set(key, 4321), doing nothing
        # would leak 4321 into the shared session fixture (ADVICE r10)
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
