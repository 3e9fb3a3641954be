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
