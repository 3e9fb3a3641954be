"""operators/ranking.rrf_fuse_weighted + the hybrid_search
branch_weights surface (r14; VERDICT r13 item 7b).

Reference anchor: chatbot/app.py:151-168 fuses dense+sparse with
Qdrant FusionQuery(RRF) over equal branches — no per-branch weight
exists there, so the weighted variant is the engine-side extension,
and w=1.0 everywhere must reproduce the certified unweighted math
exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.ranking import rrf_fuse, rrf_fuse_weighted


def _branches(spark):
    # item 10 ranks 1st dense / 3rd sparse; item 20 the mirror; item 30
    # mid in both — asymmetric weights must flip the 10-vs-20 order
    dense = spark.createDataFrame(
        [(0, 10, 1), (0, 30, 2), (0, 20, 3)], "qid long, id long, rank int"
    )
    sparse = spark.createDataFrame(
        [(0, 20, 1), (0, 30, 2), (0, 10, 3)], "qid long, id long, rank int"
    )
    return dense, sparse


def test_unit_weights_reproduce_rrf_fuse(spark):
    dense, sparse = _branches(spark)
    base = {
        (r["qid"], r["id"]): r["fused_score"]
        for r in rrf_fuse([dense, sparse], ["qid"], ["id"]).collect()
    }
    w = {
        (r["qid"], r["id"]): r["fused_score"]
        for r in rrf_fuse_weighted(
            [dense, sparse], [1.0, 1.0], ["qid"], ["id"]
        ).collect()
    }
    assert base == w  # bit-exact, not approx: same doubles, same sums


def test_asymmetric_weights_flip_the_order(spark):
    dense, sparse = _branches(spark)
    unw = rrf_fuse([dense, sparse], ["qid"], ["id"])
    tie = {r["id"]: r["fused_score"] for r in unw.collect()}
    # unweighted: items 10 and 20 tie exactly (rank sets {1,3} both)
    assert tie[10] == tie[20]
    fused = rrf_fuse_weighted([dense, sparse], [0.7, 0.3], ["qid"], ["id"])
    got = {r["id"]: r["fused_score"] for r in fused.collect()}
    # dense-favored weights break the tie toward the dense-1st item
    assert got[10] > got[20]
    expected_10 = 0.7 / 61 + 0.3 / 63
    assert got[10] == pytest.approx(expected_10, abs=1e-12)


def test_weight_count_must_match_branches(spark):
    dense, sparse = _branches(spark)
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse_weighted([dense, sparse], [0.7], ["qid"], ["id"])


def test_weighted_fusion_plan_adds_no_exchange(spark):
    """The weight rides the union as a literal column: same exchange
    count as the certified unweighted fusion (one hash aggregate)."""
    dense, sparse = _branches(spark)

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum("Exchange" in ln for ln in plan.splitlines())

    assert n_exchanges(
        rrf_fuse_weighted([dense, sparse], [0.7, 0.3], ["qid"], ["id"])
    ) == n_exchanges(rrf_fuse([dense, sparse], ["qid"], ["id"]))


def test_hybrid_search_weighted_end_to_end(spark):
    """branch_weights threads through E2: unit weights match the
    default path value-for-value; asymmetric weights still return k
    per query with ranks 1..k."""
    from lawlm_spark.plans.rag import hybrid_search, ingest_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks, postings = ingest_documents(
        docs, chunk_size=256, overlap=32, min_chunk=64
    )
    qs = spark.createDataFrame(
        [(0, "court held accordingly"), (1, "damages statute of limitations")],
        "query_id long, question string",
    )
    base = hybrid_search(chunks, postings, qs, k=3)
    unit = hybrid_search(chunks, postings, qs, k=3, branch_weights=(1.0, 1.0))
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, unit.collect())
    )
    weighted = hybrid_search(
        chunks, postings, qs, k=3, branch_weights=(0.7, 0.3)
    )
    rows = weighted.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["final_rank"])
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), qid
    assert all(r["fused_score"] > 0 for r in rows)
