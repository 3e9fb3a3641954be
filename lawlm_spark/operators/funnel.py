"""Ordered-funnel / sequential-pattern analysis over an event stream —
the MATCH_RECOGNIZE-shaped capability (Flink CEP / Trino
MATCH_RECOGNIZE / ClickHouse windowFunnel) expressed as declarative
aggregates Spark already optimizes.

Semantics ("first completion", the windowFunnel contract): per user,
stage 1 completes at the EARLIEST stage-1 event; stage k completes at
the earliest stage-k event STRICTLY AFTER the stage-(k-1) completion
time.  Strictness makes the result deterministic under same-timestamp
ties in both engines (a tied event can never advance the funnel, so no
arbitrary choice exists); the tie policy is pinned in
tests/test_funnel.py.

Scale: one filter+aggregate per stage, every shuffle keyed on the user
column — k stages cost k user-keyed exchanges over per-user rows that
AQE collapses onto one partitioning (the joins and groupBys share the
key).  Nothing is quadratic, no window over the whole event history,
no Python.  Timestamps travel as epoch MICROS (bigint) so the result
hash-matches across engines regardless of parquet timestamp encoding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, t_<stage>_us ..., stages_completed): first-completion
    times per funnel stage in epoch micros; NULL from the first
    uncompleted stage on.  Only users who completed stage 1 appear."""
    if not stages:
        raise ValueError("at least one funnel stage required")
    base = events.select(
        F.col(user_col),
        F.col(type_col).alias("_et"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    )
    tcols = [f"t_{s}_us" for s in stages]
    cur = (
        base.filter(F.col("_et") == stages[0])
        .groupBy(user_col)
        .agg(F.min("_us").alias(tcols[0]))
    )
    for k, stage in enumerate(stages[1:], start=1):
        nxt = base.filter(F.col("_et") == stage).select(
            user_col, F.col("_us").alias("_nus")
        )
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(user_col, *tcols[:k])
            .agg(
                F.min(
                    F.when(F.col("_nus") > F.col(tcols[k - 1]), F.col("_nus"))
                ).alias(tcols[k])
            )
        )
    completed = sum([F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in tcols])
    return cur.select(user_col, *tcols, completed.cast("int").alias("stages_completed"))


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage, stage_index, n_users): the funnel report — how many users
    reached each stage in order.  Monotone non-increasing by
    construction."""
    times = funnel_times(events, stages, user_col, ts_col, type_col)
    rows = [
        times.filter(F.col("stages_completed") >= i + 1).select(
            F.lit(s).alias("stage"),
            F.lit(i + 1).cast("int").alias("stage_index"),
        )
        for i, s in enumerate(stages)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.groupBy("stage", "stage_index").agg(
        F.count("*").cast("long").alias("n_users")
    )
