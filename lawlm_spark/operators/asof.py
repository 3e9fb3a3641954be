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
    direction: str = "backward",
    tolerance: float | int | None = None,
) -> DataFrame:
    """left columns + `right_value_cols` from the as-of matched right row.

    how='inner' drops left rows with no prior right row (DuckDB ASOF
    default); how='left' keeps them with nulls.

    direction='backward' (default) matches the LATEST right row at or
    before the left timestamp; 'forward' matches the EARLIEST right row
    at or after it (the "next quote/reading" lookup).  Forward is the
    same merge scan with the time axis reversed: right rows still win
    ties at the exact timestamp.

    tolerance (pandas merge_asof semantics): a match farther than
    `tolerance` from the left timestamp is treated as NO match (nulled
    under how='left', dropped under how='inner') — stale quotes stop
    propagating forever.  Units are the ts column's own (use epoch
    micros for event time, the repo-wide cross-engine convention);
    numeric ts columns only.  The check is a post-filter on the carried
    match — same single window, no extra shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
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
        .orderBy(
            F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc(),
            F.col("_tag").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the latest right row as ONE struct: the struct is non-null
    # whenever a prior right row exists — even if every value field in it
    # is NULL — so (a) matched-row detection needs no sentinel value
    # column and (b) all values come from the SAME (latest) right row
    # instead of per-column last-non-null picking older rows.
    right_struct = F.when(
        F.col("_tag") == 0,
        F.struct(
            F.col(ts_col).alias("_rts"), *[F.col(c) for c in right_value_cols]
        ),
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "_tag",
        F.last(right_struct, ignorenulls=True).over(w).alias("_asof"),
    )
    out = carried.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance is not None:
        # delta >= 0 by construction (the carried row is on the match side)
        delta = (
            F.col(ts_col) - F.col("_asof").getField("_rts")
            if direction == "backward"
            else F.col("_asof").getField("_rts") - F.col(ts_col)
        )
        out = out.withColumn(
            "_asof", F.when(delta <= F.lit(tolerance), F.col("_asof"))
        )
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    for c in right_value_cols:
        out = out.withColumn(c, F.col("_asof").getField(c))
    return out.drop("_asof")
