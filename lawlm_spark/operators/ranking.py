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

from lawlm_spark.functions.vectors import cos_micros_py

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


def mmr_select(
    cands: DataFrame,
    query_col: str,
    id_col: str,
    vec_col: str,
    rel_micros_col: str = "rel_micros",
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell & Goldstein
    1998) over a per-query candidate set: greedily pick k items, each
    maximizing λ·rel − (1−λ)·max_sim_to_already_selected.

    Beyond-reference retrieval: the reference returns the raw Qdrant
    top-k (app.py:151-170) — near-duplicate chunks of one document crowd
    out every other source; MMR is the standard de-crowding pass.

    Cross-engine-exact by construction: λ = lam_num/lam_den rides as
    exact integers, relevance and pairwise similarity enter as integer
    micro-units (round(cos·1e6) — the vectors.cos_micros contract), so
    the greedy compares `mmr_scaled = lam_num*rel −
    (lam_den−lam_num)*max_sim` — pure integer math with (−score, id)
    tie-breaking; the DuckDB oracle replays the identical selection
    with a recursive CTE.  The first pick has no selected set: its
    score is lam_num*rel (the sim term is empty, not zero-filled —
    documented so the oracle anchor matches).  The pairwise sims are
    computed INSIDE the grouped greedy by `vectors.cos_micros_py` — an exact
    Python replica of vectors.cos_micros (same left-to-right double
    fold, same IEEE sqrt/divide/scale, shortest-repr decimal HALF_UP
    round), pinned against the JVM expression by
    test_mmr_scores_match_integer_recompute — so the N² broadcast pair
    join the r14 shape paid (VERDICT r14 item 5) is gone entirely.

    Scale shape: candidate generation is the ANN problem (certified
    separately: d8/d8b/r4-r8); MMR itself touches only per-query top-N
    sets.  ONE exchange on the query key into a single
    FlatMapGroupsInPandas (plan-pinned); the greedy evaluates exactly
    the O(k·N) candidate-vs-newly-selected cosines (each pair once,
    feeding an incremental per-candidate running max), never the N²
    pair matrix, and vectors cross to Arrow once as group columns
    instead of twice through a join.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 < lam_num <= lam_den:
        raise ValueError(f"need 0 < lam_num <= lam_den, got {lam_num}/{lam_den}")
    qt = dict(cands.dtypes)[query_col]
    it = dict(cands.dtypes)[id_col]
    w_sim = lam_den - lam_num

    def greedy(key, cpd):
        import pandas as pd

        rel = {
            i: int(r)
            for i, r in zip(cpd[id_col].tolist(), cpd[rel_micros_col].tolist())
        }
        vecs = dict(zip(cpd[id_col].tolist(), cpd[vec_col].tolist()))
        remaining = sorted(rel)
        selected: list = []
        # incremental running max-sim per candidate: after each pick,
        # a candidate's max over the selected set can only change via
        # the NEWLY selected item — O(k·N) sim updates total instead
        # of rescanning the selected list per candidate per step
        best_ms: dict = {}
        out = {query_col: [], "rn": [], id_col: [], rel_micros_col: [], "mmr_scaled": []}
        for step in range(1, min(k, len(remaining)) + 1):
            best_key, best = None, None
            for c in remaining:
                if selected:
                    score = lam_num * rel[c] - w_sim * best_ms[c]
                else:
                    score = lam_num * rel[c]
                cand_key = (-score, c)
                if best_key is None or cand_key < best_key:
                    best_key, best = cand_key, (c, score)
            c, score = best
            selected.append(c)
            remaining.remove(c)
            for o in remaining:
                s_new = cos_micros_py(vecs[o], vecs[c])
                if o not in best_ms or s_new > best_ms[o]:
                    best_ms[o] = s_new
            out[query_col].append(key[0])
            out["rn"].append(step)
            out[id_col].append(c)
            out[rel_micros_col].append(rel[c])
            out["mmr_scaled"].append(score)
        return pd.DataFrame(out)

    schema = (
        f"{query_col} {qt}, rn int, {id_col} {it}, "
        f"{rel_micros_col} long, mmr_scaled long"
    )
    return (
        cands.select(query_col, id_col, rel_micros_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(greedy, schema=schema)
    )
