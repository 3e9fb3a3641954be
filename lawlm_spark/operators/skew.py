"""Skew mitigation: salting for hot keys (task brief; SURVEY §4).

AQE's skew-join splitting (enabled in session.py) handles most skewed
SHUFFLE JOINS at runtime.  Salting remains the tool for the cases AQE
does not cover: skewed AGGREGATIONS (one hot group overwhelms a single
reducer) and stream-static joins where AQE cannot re-plan.

  salted_aggregate — two-phase agg: groupBy(keys + salt) partials, then
      groupBy(keys) combine.  The hot key's rows spread over
      `salt_buckets` reducers in phase 1; phase 2 combines `salt_buckets`
      rows per key (tiny).
  salted_join      — big side gets a per-row salt, the smaller (but not
      broadcastable) side is replicated salt_buckets times; the join key
      becomes (key, salt) so one hot key spreads across reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(n: int) -> Column:
    # uniform per-row bucket; needs no cross-run stability, only uniformity
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_alias: str | None = "n",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate: counts and sums (the decomposable
    aggregates the reference's counters need — O25 at scale)."""
    partial_aggs = []
    if count_alias:
        partial_aggs.append(F.count("*").alias(f"__c_{count_alias}"))
    partial_aggs += [F.sum(c).alias(f"__s_{c}") for c in sums]
    partial = (
        df.withColumn("__salt", _row_salt(salt_buckets))
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    final_aggs = []
    if count_alias:
        final_aggs.append(F.sum(f"__c_{count_alias}").alias(count_alias))
    final_aggs += [F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sums]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Use when the small side is too large to broadcast but small enough
    to replicate `salt_buckets` times; result equals big.join(small, key).
    """
    big_s = big.withColumn("__salt", _row_salt(salt_buckets))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_s, [key, "__salt"], how).drop("__salt")


def skew_report(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """(key, cnt, share, rank): the k hottest keys and their share of
    all rows — the diagnostic that DECIDES between a plain and a salted
    plan (salted_aggregate/salted_join above; AQE's skew-join handles
    the shuffle-partition half, but a hot GROUP key still needs the
    salt).  Rule of thumb: share > ~1/shuffle_partitions on the top key
    means one task owns that key's entire partition — salt it.

    One keyed count (map-side combine), one singleton total broadcast,
    TakeOrderedAndProject for the top-k — safe to run on the full
    100 TB input as a planning probe.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    top = (
        counts.crossJoin(F.broadcast(total))
        .select(
            key_col,
            "cnt",
            F.round(F.col("cnt") / F.col("_total").cast("double"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), key_col)
        .limit(k)
    )
    from pyspark.sql import Window

    return top.withColumn(
        "rank",
        # bounded window over the limit(k) relation (allowlisted in
        # test_window_hygiene.py)
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.col(key_col))),
    )
