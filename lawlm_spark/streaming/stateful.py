"""Custom stateful streaming operator via applyInPandasWithState
(task brief: the escape hatch for operators Spark's built-in streaming
aggregates can't express).

`stateful_running_totals` keeps per-key state (event count, value sum)
across micro-batches and emits the updated totals for every key seen in
each batch — the building block for the reference's run-level counters
(O25) as a *continuous* metric, and the template for custom session
logic, CDC folding, or online feature accumulation.

State is a single struct row per key — bounded, and partitioned by the
grouping key so a 1000-executor cluster shards state linearly.  With
NoTimeout the state lives for the query's lifetime; production variants
add GroupStateTimeout.ProcessingTimeTimeout to expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_updates", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("updates", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, updates = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    updates += 1
    state.update((n, total, updates))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "n_updates": [updates]}
    )


def stateful_running_totals(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Running (count, sum) per key across micro-batches; one output row
    per key per batch carrying the post-update totals."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_running_totals(spark, sf_dir: str):
    """V36: the applyInPandasWithState operator executed as a REAL
    two-micro-batch streaming query, certifying cross-batch state.

    The events table is split deterministically (even event_ids land
    first, odd second) into two files with strictly increasing mod
    times; `maxFilesPerTrigger=1` makes each file one micro-batch, so a
    user active in both halves gets TWO update-mode emissions — the
    second carrying totals accumulated across the batch boundary with
    n_updates=2.  That is exactly the state behavior a batch aggregate
    cannot produce, yet the full output IS batch-expressible (partial
    agg over half 1, combined agg over both halves), which is the
    DuckDB oracle.
    """
    import os
    import shutil
    import tempfile
    import uuid as uuidlib

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path).select("event_id", "user_id", "value")

    landing = os.path.join(tempfile.gettempdir(), f"v36_{uuidlib.uuid4().hex[:8]}")
    os.makedirs(landing)
    t0 = 1_600_000_000  # fixed epoch base; only relative order matters
    for i in (0, 1):
        part_dir = os.path.join(landing, f"_stage{i}")
        batch.filter(F.col("event_id") % 2 == i).coalesce(1).write.parquet(part_dir)
        part_file = next(
            f for f in os.listdir(part_dir) if f.endswith(".parquet")
        )
        dst = os.path.join(landing, f"half{i}.parquet")
        shutil.move(os.path.join(part_dir, part_file), dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (t0 + i * 60, t0 + i * 60))  # half0 strictly older

    schema = spark.read.parquet(os.path.join(landing, "half0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(landing)
    )
    totals = stateful_running_totals(stream.select("user_id", "value"))
    sink = f"v36_sink_{uuidlib.uuid4().hex[:8]}"
    q = (
        totals.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), f"ckpt_{sink}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        "user_id",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        "n_updates",
    )
