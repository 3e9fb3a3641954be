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
    uncompleted stage on.  Only users who completed stage 1 appear.

    ONE corpus scan, ONE user-keyed exchange (r8; the earlier
    join-per-stage form scanned the source k times): funnel-relevant
    events pivot into one per-stage timestamp array per user, then the
    first-completion recurrence runs in pure codegen — t_1 =
    array_min(list_1); t_k = array_min(filter(list_k, x > t_{k-1})),
    where a NULL t_{k-1} or a missing list short-circuits to NULL for
    every later stage.  Memory is bounded by the hottest single user's
    funnel-event count (per-user lists), the windowFunnel trade
    everywhere; the `_et IN stages` filter is pushed to the scan so
    non-funnel event types never leave parquet.
    """
    if not stages:
        raise ValueError("at least one funnel stage required")
    base = events.select(
        F.col(user_col),
        F.col(type_col).alias("_et"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    ).filter(F.col("_et").isin(list(stages)))
    lcols = [f"_l{i}" for i in range(len(stages))]
    lists = base.groupBy(user_col).agg(
        *[
            F.collect_list(F.when(F.col("_et") == s, F.col("_us"))).alias(c)
            for s, c in zip(stages, lcols)
        ]
    )
    tcols = [f"t_{s}_us" for s in stages]
    cur = lists.withColumn(tcols[0], F.array_min(F.col(lcols[0])))
    for k in range(1, len(stages)):
        prev = F.col(tcols[k - 1])
        cur = cur.withColumn(
            tcols[k],
            F.array_min(F.filter(F.col(lcols[k]), lambda x: x > prev)),
        )
    completed = sum([F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in tcols])
    return cur.filter(F.col(tcols[0]).isNotNull()).select(
        user_col, *tcols, completed.cast("int").alias("stages_completed")
    )


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage, stage_index, n_users): the funnel report — how many users
    reached each stage in order.  Monotone non-increasing by
    construction.

    One pass: a user who completed c stages explodes into rows for
    stage_index 1..c, then one aggregate.  (A per-stage filter+union
    replicates the funnel_times lineage into every branch — k corpus
    scans for a k-stage funnel, the r8 hist_quantiles lesson.)
    """
    times = funnel_times(events, stages, user_col, ts_col, type_col)
    stage_arr = F.array(*[F.lit(s) for s in stages])
    reached = times.filter(F.col("stages_completed") >= 1).select(
        F.explode(
            F.sequence(F.lit(1), F.col("stages_completed"))
        ).alias("stage_index")
    )
    return (
        reached.select(
            F.element_at(stage_arr, F.col("stage_index")).alias("stage"),
            F.col("stage_index").cast("int").alias("stage_index"),
        )
        .groupBy("stage", "stage_index")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
