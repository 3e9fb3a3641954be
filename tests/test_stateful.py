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
