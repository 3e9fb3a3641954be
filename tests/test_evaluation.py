"""Retrieval metrics (operators/evaluation.py)."""

from __future__ import annotations

from lawlm_spark.operators.evaluation import retrieval_metrics


def _dfs(spark, results, labels):
    r = spark.createDataFrame(results, "query_id long, doc_id long, rank int")
    l = spark.createDataFrame(labels, "query_id long, doc_id long")
    return r, l


def test_metrics_hand_case(spark):
    # q1: relevant {10, 11, 12}; retrieved hits at ranks 1 and 3
    results = [(1, 10, 1), (1, 99, 2), (1, 11, 3), (1, 98, 4)]
    labels = [(1, 10), (1, 11), (1, 12)]
    r, l = _dfs(spark, results, labels)
    row = retrieval_metrics(r, l, k=10).first()
    assert row["n_relevant"] == 3 and row["n_hit"] == 2
    assert abs(row["recall_at_k"] - 2 / 3) < 1e-6
    assert row["mrr"] == 1.0  # first hit at rank 1
    import math

    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert abs(row["dcg"] - dcg) < 1e-5
    assert abs(row["ndcg"] - dcg / idcg) < 1e-5


def test_metrics_zero_hits_and_missing_query(spark):
    # q1 retrieves nothing relevant; q2 retrieves nothing at all
    results = [(1, 99, 1)]
    labels = [(1, 10), (2, 20)]
    r, l = _dfs(spark, results, labels)
    got = {x["query_id"]: x for x in retrieval_metrics(r, l, k=5).collect()}
    assert got[1]["recall_at_k"] == 0.0 and got[1]["mrr"] == 0.0 and got[1]["ndcg"] == 0.0
    assert got[2]["n_hit"] == 0 and got[2]["ndcg"] == 0.0


def test_metrics_k_cutoff(spark):
    # the hit at rank 7 must not count at k=5
    results = [(1, 10, 7)]
    labels = [(1, 10)]
    r, l = _dfs(spark, results, labels)
    assert retrieval_metrics(r, l, k=5).first()["n_hit"] == 0
    assert retrieval_metrics(r, l, k=10).first()["n_hit"] == 1


def test_perfect_ranking_ndcg_one(spark):
    results = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    labels = [(1, 10), (1, 11), (1, 12)]
    r, l = _dfs(spark, results, labels)
    row = retrieval_metrics(r, l, k=3).first()
    assert row["ndcg"] == 1.0 and row["recall_at_k"] == 1.0 and row["mrr"] == 1.0
