"""Retrieval evaluation: recall@k, MRR, nDCG — the measurement half of
the search stack (operators/similarity, bm25, plans/rag produce
rankings; this scores them against relevance labels).

Metrics per query, one row each — never a pre-averaged scalar (the d47
discipline: cross-query averaging is the caller's one tiny driver-side
fold, and per-query rows are what error analysis needs anyway).

Determinism: recall and MRR are exact small-integer rationals; DCG
terms are 1/log2(rank+1) — log2 is not correctly-rounded-guaranteed,
and the per-query sum adds ≤ k doubles in group order, so DCG/IDCG and
nDCG are rounded to 6 (absorbs any last-ulp engine difference, cf. the
d46/d47 ln handling).

Scale shape: one join of results to the (broadcast-size) label set on
(query, doc), one per-query aggregate.  The label side of an eval run
is always tiny next to the corpus — it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    labels: DataFrame,
    qid_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """(qid, n_relevant, n_hit, recall_at_k, mrr, dcg, idcg, ndcg).

    `results`: one row per retrieved item with its 1-based rank;
    `labels`: the relevant (qid, doc) pairs (binary relevance).
    Queries present in `labels` but retrieving nothing still score
    (zero metrics); queries without any relevant docs are excluded —
    their metrics are undefined, not zero.
    """
    res = results.select(
        F.col(qid_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_r"),
    ).filter(F.col("_r") <= k)
    lab = labels.select(
        F.col(qid_col).alias("_q"), F.col(doc_col).alias("_d")
    ).distinct()
    n_rel = lab.groupBy("_q").agg(F.count(F.lit(1)).alias("n_relevant"))
    hits = res.join(F.broadcast(lab), ["_q", "_d"])
    per_q = hits.groupBy("_q").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.min("_r").alias("_first_rank"),
        F.sum(
            F.lit(1.0) / F.log2(F.col("_r").cast("double") + F.lit(1.0))
        ).alias("_dcg"),
    )
    idcg = F.aggregate(
        F.sequence(
            F.lit(1), F.least(F.lit(k), F.col("n_relevant")).cast("int")
        ),
        F.lit(0.0),
        lambda acc, i: acc
        + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return (
        n_rel.join(per_q, "_q", "left")
        .select(
            F.col("_q").alias(qid_col),
            "n_relevant",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0))
                / F.col("n_relevant").cast("double"),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("_first_rank").cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("mrr"),
            F.round(F.coalesce("_dcg", F.lit(0.0)), 6).alias("dcg"),
            F.round(idcg, 6).alias("idcg"),
            F.round(
                F.coalesce("_dcg", F.lit(0.0)) / idcg, 6
            ).alias("ndcg"),
        )
    )
