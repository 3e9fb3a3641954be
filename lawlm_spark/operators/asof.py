"""As-of join: each left row matched with the latest right row at or
before its timestamp, per key (task brief: custom operators Spark lacks,
expressed as a composition of built-in DataFrame ops).

Implementation is the merge-scan pattern, NOT a range cross-join:

  union(left tagged 1, right tagged 0)
  -> window per key ordered by (ts, tag): last non-null right value
     carried forward (rows between unbounded preceding and current)
  -> keep left rows with a match

One shuffle on the key, a single ordered scan per key — linear at 100 TB
(a naive l.ts >= r.ts range join is quadratic per key).  Right rows sort
before left rows at equal timestamps (tag order), so a right row at
exactly the left timestamp matches — the same tie rule as DuckDB's
native ASOF JOIN (the v19 oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """left columns + `right_value_cols` from the as-of matched right row.

    how='inner' drops left rows with no prior right row (DuckDB ASOF
    default); how='left' keeps them with nulls.
    """
    l_tagged = left.withColumn("_tag", F.lit(1))
    r_tagged = right.select(
        key_col, ts_col, *right_value_cols
    ).withColumn("_tag", F.lit(0))

    for c in right_value_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(r_tagged.dtypes)[c]))
    missing_in_right = [c for c in l_tagged.columns if c not in r_tagged.columns]
    for c in missing_in_right:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(l_tagged.dtypes)[c]))

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "_tag",
        *[
            F.last(F.when(F.col("_tag") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in right_value_cols
        ],
    )
    out = carried.filter(F.col("_tag") == 1).drop("_tag")
    for c in right_value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    if how == "inner":
        out = out.filter(F.col(right_value_cols[0]).isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out
