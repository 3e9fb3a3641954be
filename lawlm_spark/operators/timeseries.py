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
