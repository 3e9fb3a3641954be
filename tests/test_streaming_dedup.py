"""Watermarked streaming dedup: late duplicates dropped with bounded state."""

from __future__ import annotations

import tempfile
import uuid

from lawlm_spark.streaming.events import watermarked_dedup


def test_watermarked_dedup_drops_duplicates(spark):
    src = tempfile.mkdtemp(prefix="stream_dup_src_")
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),  # duplicate key within watermark -> dropped
        (2, "2024-01-01 00:05:00"),
        (3, "2024-01-01 01:00:00"),
        (2, "2024-01-01 00:06:00"),  # duplicate
    ]
    spark.createDataFrame(rows, "event_id long, ts_s string").selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = watermarked_dedup(stream, "ts", "event_id", horizon="1 hour")

    sink = f"dedup_sink_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_dedup_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(sink).collect()
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]


def test_dedup_within_watermark_matches_batch_distinct(spark):
    from lawlm_spark.streaming.events import run_streaming_dedup_within_watermark
    from lawlm_spark.sources.testdata import load_table

    out = run_streaming_dedup_within_watermark(spark, "/root/testdata/sf0.001")
    got = sorted(
        (r["event_id"], r["user_id"], r["event_type"]) for r in out.collect()
    )
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    want = sorted(
        (r["event_id"], r["user_id"], r["event_type"])
        for r in ev.select("event_id", "user_id", "event_type").distinct().collect()
    )
    assert got == want
