"""Time-series regularization: resample an irregular event stream onto
a fixed grid with forward fill — the gap-filling / LOCF operator
time-series stores ship natively (TimescaleDB `time_bucket_gapfill` +
`locf`, InfluxDB `fill(previous)`) and Spark does not.

Shape: bucket each observation to the step grid (integer epoch-micros
arithmetic — exact in any engine), keep the LAST observation per
(key, bucket) with a (ts, id) tiebreak, explode each key's
[min_bucket, max_bucket] range into the full grid (`sequence` — rows
expand per key by gap size, a narrow explode), left-join observations,
and forward-fill with `last(value, ignorenulls=True)` over the per-key
bucket order.

Scale (audited plan at sf0.001): the last-per-bucket window exchanges
on (key, bucket) and WindowGroupLimit prunes each bucket to one row
BEFORE the sort materializes; the pruned observation table then
BROADCASTS into the grid join; the grid side exchanges once on the key
and the forward-fill window reuses that partitioning (partial sort, no
second exchange on that side).  Grid density is the knob: step × key
cardinality bounds the output, independent of input skew.  No Python
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    step_us: int = 3_600_000_000,  # 1 hour
) -> DataFrame:
    """(key, bucket_us, value, observed): the value sampled at each grid
    point — the last observation in the bucket, or the previous bucket's
    carried value (observed = false) for gaps.  Leading gaps cannot
    exist (each key's grid starts at its first observation)."""
    obs = events.select(
        F.col(key_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(value_col).alias("_v"),
        F.col(order_col).alias("_ord"),
    ).withColumn("bucket_us", F.col("_us") - F.col("_us") % F.lit(step_us))
    w_last = Window.partitionBy(key_col, "bucket_us").orderBy(
        F.col("_us").desc(), F.col("_ord").desc()
    )
    per_bucket = (
        obs.withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(key_col, "bucket_us", F.col("_v"))
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket_us").alias("_lo"), F.max("bucket_us").alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_us))
            ).alias("bucket_us"),
        )
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, [key_col, "bucket_us"], "left")
        .select(
            key_col,
            "bucket_us",
            F.last("_v", ignorenulls=True).over(w_fill).alias(value_col),
            F.col("_v").isNotNull().alias("observed"),
        )
    )


RESAMPLE_FFILL_ORACLE_SQL = """
    WITH obs AS (
        SELECT {key} AS k, epoch_us(CAST({ts} AS TIMESTAMP)) AS us,
               {value} AS v, {ord} AS o
        FROM {src}
    ),
    bucketed AS (
        SELECT k, us - us % {step} AS bucket_us, v, us, o FROM obs
    ),
    per_bucket AS (
        SELECT k, bucket_us, v FROM bucketed
        QUALIFY row_number() OVER (PARTITION BY k, bucket_us
                                   ORDER BY us DESC, o DESC) = 1
    ),
    grid AS (
        SELECT k, unnest(generate_series(min(bucket_us), max(bucket_us),
                                         {step})) AS bucket_us
        FROM bucketed GROUP BY k
    )
    SELECT g.k AS {key}, g.bucket_us,
           last_value(p.v IGNORE NULLS) OVER (
               PARTITION BY g.k ORDER BY g.bucket_us
               ROWS UNBOUNDED PRECEDING) AS {value},
           p.v IS NOT NULL AS observed
    FROM grid g LEFT JOIN per_bucket p
      ON g.k = p.k AND g.bucket_us = p.bucket_us
"""


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_us: int = 604_800_000_000,  # 1 week
) -> DataFrame:
    """(cohort_period, period_offset, active_users, cohort_size,
    retention): classic cohort retention — users bucketed by the period
    of their FIRST event, then distinct-active counts per (cohort,
    periods-since-cohort) cell.

    Periods are integer epoch-micros floor-divisions (exact cross-
    engine; `ts` must already be TIMESTAMP — run
    streaming.events.normalize_event_time first, per the repo-wide
    event-time contract).  retention = active/cohort_size is one IEEE
    division of two small integers — deterministic — rounded to 6 per
    house convention.

    Scale: the first-event aggregate shuffles once on the user key and
    the activity join reuses that partitioning (user-keyed join against
    the just-aggregated side — AQE sees both sides hashed on `u`); the
    (cohort, offset) aggregate's key cardinality is periods², tiny; the
    cohort_size side joins as a broadcast.  No window over all events,
    no per-user collect.
    """
    p = F.expr(f"unix_micros({ts_col}) div {period_us}")
    w = events.select(F.col(user_col).alias("u"), p.alias("p"))
    first = w.groupBy("u").agg(F.min("p").alias("cohort_period"))
    sizes = first.groupBy("cohort_period").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        w.join(first, "u")
        .groupBy(
            "cohort_period",
            (F.col("p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count_distinct("u").alias("active_users"))
    )
    return active.join(F.broadcast(sizes), "cohort_period").select(
        "cohort_period",
        "period_offset",
        "active_users",
        "cohort_size",
        F.round(F.col("active_users") / F.col("cohort_size"), 6).alias("retention"),
    )


def debounce(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int = 600_000_000,  # 10 minutes
) -> DataFrame:
    """Rows whose predecessor (same keys, event-time order) is more than
    `gap_us` older — batch debounce: collapse bursts of repeated
    signals (double-clicks, retry storms, sensor chatter) to their
    first occurrence.

    Semantics: the gap is measured to the previous RAW event, so a
    chained burst (every inter-event gap < gap_us) collapses to ONE
    row — its opener — even when the burst's total span exceeds the
    gap.  That is leading-edge debounce with reset, the session-gap
    dual of v18's windows (v18 groups a burst; this keeps only its
    first row).  One window per key partition, epoch-micros integer
    comparison, no state beyond lag(1).  The streaming counterpart
    with bounded state is dropDuplicatesWithinWatermark (v46).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    return (
        events.withColumn("_prev_us", prev)
        .filter(
            F.col("_prev_us").isNull()
            | (F.unix_micros(F.col(ts_col)) - F.col("_prev_us") > gap_us)
        )
        .drop("_prev_us")
    )
