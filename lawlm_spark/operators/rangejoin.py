"""Range (interval) join: points matched to intervals containing them
(SURVEY §2.6 gap ledger: the reference has no theta/range joins; a
complete engine serves them — and a naive `p.ts BETWEEN i.start AND
i.end` theta join is a per-key cross product Spark executes as
BroadcastNestedLoop, quadratic at scale).

Bucketized plan (linear):
  intervals -> explode to the time buckets they cover
  points    -> their single bucket
  equi-join on (key, bucket)  [hash join, shuffles on real keys]
  -> exact range filter re-applied

Bucket width trades replication (intervals copied into ceil(len/width)
buckets) against join selectivity; pick width ≈ typical interval
length.  Semantics: half-open [start, end) — documented, tested, and
mirrored by the v24 oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """points columns + matched interval columns, ts in [start, end)."""
    p = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
    )
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    return (
        p.join(i, [key_col, "_bucket"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )
