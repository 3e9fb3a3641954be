"""Cogrouped applyInPandas: the two-sided Python escape hatch.

`groupBy().cogroup().applyInPandas` hands BOTH sides' rows for one key
to a single pandas function — the surface for per-key logic that needs
two tables at once and can't be a join (sequence alignment, per-entity
reconciliation, feature joins with imperative fallbacks).  Covered here
with `conversion_lags`: per purchase, the most recent prior click of
the same user and the time lag — pandas `merge_asof` per key, which is
exactly an as-of join, so the DuckDB oracle (v42) can replay it in SQL
and hash-match.

Scale: cogroup shuffles each side once on the key and streams one key
group at a time through Arrow batches — per-key memory, not per-side;
a key's groups must fit in one task, the same contract as any grouped
applyInPandas.  Tiebreaks are pinned (max click ts, then max click id)
so results are partitioning- and engine-independent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id long, purchase_id long, click_id long, lag_us long"


def _lags(key: tuple, clicks: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    if clicks.empty or purchases.empty:
        return pd.DataFrame(columns=["user_id", "purchase_id", "click_id", "lag_us"])
    c = clicks.sort_values(["ts", "event_id"]).rename(
        columns={"event_id": "click_id", "ts": "click_ts"}
    )
    p = purchases.sort_values(["ts", "event_id"]).rename(
        columns={"event_id": "purchase_id"}
    )
    # backward asof: last click with click_ts <= purchase ts; the sort
    # above makes the within-tie winner the max click_id
    m = pd.merge_asof(
        p[["purchase_id", "ts"]],
        c[["click_id", "click_ts"]],
        left_on="ts",
        right_on="click_ts",
        direction="backward",
    )
    m = m.dropna(subset=["click_id"])
    if m.empty:
        return pd.DataFrame(columns=["user_id", "purchase_id", "click_id", "lag_us"])
    lag_us = (
        m["ts"].astype("int64") - m["click_ts"].astype("int64")
    ) // 1000  # ns -> us
    return pd.DataFrame(
        {
            "user_id": int(key[0]),
            "purchase_id": m["purchase_id"].astype("int64"),
            "click_id": m["click_id"].astype("int64"),
            "lag_us": lag_us.astype("int64"),
        }
    )


def conversion_lags(
    clicks: DataFrame, purchases: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """(user_id, purchase_id, click_id, lag_us): per purchase, the most
    recent prior click of the same user (ties to the highest click id);
    purchases with no prior click are dropped."""
    return (
        clicks.groupBy(key_col)
        .cogroup(purchases.groupBy(key_col))
        .applyInPandas(_lags, schema=OUT_SCHEMA)
    )
