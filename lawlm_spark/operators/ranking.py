"""Ranking operators: top-k windows, RRF fusion, threshold, limit.

Spark mappings of SURVEY.md §2.5 (O29-O33):
  top_k        — row_number window; with a trailing global sort+limit this
                 compiles to TakeOrderedAndProject (no full sort at scale)
  rrf_fuse     — per-branch rank windows -> union -> hash aggregate
                 Σ 1/(k + rank); the reference delegates this to Qdrant's
                 FusionQuery(RRF) (app.py:167-168), k=60 Qdrant default
  threshold    — score filter (app.py:169-170, config.yml:59)

Tie-breaking is always made explicit (score desc, id asc) so results are
deterministic across partitionings — required for the value-hash oracle
and for stable re-runs on a cluster (SURVEY.md §7 "RRF tie-breaking").

Scale notes: rank/row_number windows shuffle once on the partition key
(query_id).  Branches of the fusion reuse the same (query_id) hash
partitioning, so AQE keeps the union + aggregate co-partitioned; the
final per-query top-k is another window over the same key — one shuffle
total for the whole fusion pipeline after the score joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # Qdrant default (SURVEY.md O31)


def top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Column,
    k: int,
    tiebreak: Sequence[str] = (),
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k with deterministic tiebreak (O29/O33/V7).

    Both shapes are scale-safe: grouped windows compile to
    WindowGroupLimit (partial top-k before the shuffle, PLANS.md v7/v8);
    the ungrouped shape is rewritten by Spark to TakeOrderedAndProject
    (per-partition heap + merge — verified in the v9_bm25_topk plan), so
    no global single-partition sort ever materializes.
    """
    order = [order_by, *[F.col(c).asc() for c in tiebreak]]
    w = Window.partitionBy(*partition_by).orderBy(*order) if partition_by else Window.orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    score: Column,
    tiebreak: Sequence[str],
    rank_col: str = "rank",
) -> DataFrame:
    """Dense branch ranking used by RRF: rank = row_number by score desc."""
    w = Window.partitionBy(*partition_by).orderBy(
        score.desc(), *[F.col(c).asc() for c in tiebreak]
    )
    return df.withColumn(rank_col, F.row_number().over(w))


def rrf_fuse(
    branches: Sequence[DataFrame],
    group_cols: Sequence[str],
    id_cols: Sequence[str],
    rank_col: str = "rank",
    k: int = RRF_K,
) -> DataFrame:
    """Reciprocal Rank Fusion: score = Σ_branches 1/(k + rank).

    Each branch must carry group_cols + id_cols + rank_col.  Returns one
    row per (group, id) with `fused_score`.
    """
    keep = [*group_cols, *id_cols, rank_col]
    unioned = branches[0].select(*keep)
    for b in branches[1:]:
        unioned = unioned.unionByName(b.select(*keep))
    return unioned.groupBy(*group_cols, *id_cols).agg(
        F.sum(1.0 / (F.lit(float(k)) + F.col(rank_col))).alias("fused_score")
    )


def rrf_fuse_weighted(
    branches: Sequence[DataFrame],
    weights: Sequence[float],
    group_cols: Sequence[str],
    id_cols: Sequence[str],
    rank_col: str = "rank",
    k: int = RRF_K,
) -> DataFrame:
    """Weighted Reciprocal Rank Fusion: score = Σ_b w_b / (k + rank_b).

    The engine-side generalization of the reference's unweighted Qdrant
    fusion (app.py:151-168 runs FusionQuery(RRF) over equal branches —
    Qdrant exposes no per-branch weight, so biasing dense vs sparse is
    only expressible once fusion happens in the engine).  w_b = 1.0 for
    every branch reproduces rrf_fuse exactly (pinned by test).  Same
    plan shape as rrf_fuse: the weight rides the union as a literal
    column, one hash aggregate on (group, id) — no extra exchange.
    """
    if len(branches) != len(weights):
        raise ValueError(
            f"{len(branches)} branches but {len(weights)} weights"
        )
    keep = [*group_cols, *id_cols, rank_col]
    tagged = [
        b.select(*keep, F.lit(float(w)).alias("_w"))
        for b, w in zip(branches, weights)
    ]
    unioned = tagged[0]
    for b in tagged[1:]:
        unioned = unioned.unionByName(b)
    return unioned.groupBy(*group_cols, *id_cols).agg(
        F.sum(F.col("_w") / (F.lit(float(k)) + F.col(rank_col))).alias(
            "fused_score"
        )
    )


def threshold(df: DataFrame, score_col: str, min_score: float) -> DataFrame:
    """O32 score-threshold filter."""
    return df.filter(F.col(score_col) >= min_score)
