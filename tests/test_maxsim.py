"""Late-interaction MaxSim retrieval tests (operators/maxsim.py, r15).

Covers: semantics vs a brute-force python replay of the published
definition (sum over query token POSITIONS of the max doc-token cosine)
— which also pins that the distinct-token + count-weight regrouping is
exact; the duplicate-token invariances behind that regrouping; the
max_tokens position cap; empty docs/queries; validation; and the plan
pins behind the scale claims — query side broadcasts, the only corpus
exchanges are the two keyed aggregates and the top-k window, none
single-partition.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lawlm_spark.functions.vectors import cos_micros_py
from lawlm_spark.operators.maxsim import (
    maxsim_topk,
    query_token_weights,
    token_vectors,
)

TOKEN_RE = "[a-z0-9]+"


def _tokens(text):
    import re

    return re.findall(TOKEN_RE, text.lower())


def _fake_vec(spark, token, dim=16):
    # derive the reference vector from the ENGINE's own fake_embedding
    # (its cross-engine exactness is certified by the v10 family); the
    # brute replay below only needs "some deterministic per-token vec"
    from lawlm_spark.functions.vectors import fake_embedding

    row = (
        spark.range(1)
        .select(fake_embedding(F.lit(token), dim).alias("v"))
        .collect()[0]
    )
    return row.v


def _brute_maxsim(spark, docs, queries, dim=16, max_tokens=None, k=10):
    """Published definition, per query token POSITION (no distinct, no
    weights) over the capped doc-token prefix."""
    vec_cache: dict[str, list[float]] = {}

    def vec(t):
        if t not in vec_cache:
            vec_cache[t] = _fake_vec(spark, t, dim)
        return vec_cache[t]

    out = []
    for qid, qtext in queries:
        qtoks = _tokens(qtext)
        if not qtoks:
            continue
        scored = []
        for did, dtext in docs:
            dtoks = _tokens(dtext)
            if max_tokens is not None:
                dtoks = dtoks[:max_tokens]
            if not dtoks:
                continue
            score = sum(
                max(cos_micros_py(vec(qt), vec(dt)) for dt in set(dtoks))
                for qt in qtoks
            )
            scored.append((did, score))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rn, (did, score) in enumerate(scored[:k], 1):
            out.append((qid, did, score, rn))
    return sorted(out)


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "quick quick quick fox fox"),  # heavy duplicates
    (4, "sphinx of black quartz judge my vow"),
    (5, ""),  # no tokens: never scored
    (6, "fox dog jugs vow"),
]

QUERIES = [
    (10, "quick fox"),
    (11, "dog dog jugs"),  # repeated query token: counts twice
    (12, "zzz qqq"),       # vocabulary miss: still scores (fake vecs exist)
]


def _run(spark, docs=DOCS, queries=QUERIES, dim=16, max_tokens=None, k=10):
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, question string")
    dtok = token_vectors(ddf, "doc_id", "text", dim=dim, max_tokens=max_tokens)
    qtok = query_token_weights(qdf, "query_id", "question", dim=dim)
    return maxsim_topk(dtok, qtok, "doc_id", "query_id", k=k)


def test_maxsim_matches_brute(spark):
    got = sorted(tuple(r) for r in _run(spark).collect())
    assert got == _brute_maxsim(spark, DOCS, QUERIES)


def test_maxsim_respects_token_cap(spark):
    """With max_tokens=2 only each doc's first two token positions
    exist: doc 6 keeps (fox, dog) and loses (jugs, vow)."""
    got = sorted(tuple(r) for r in _run(spark, max_tokens=2).collect())
    assert got == _brute_maxsim(spark, DOCS, QUERIES, max_tokens=2)


def test_maxsim_duplicate_tokens_dont_change_scores(spark):
    """Doc-side duplicates are redundant under the inner max: doc 3
    scores exactly like its distinct-token twin."""
    twin = [(3, "quick fox")]
    base = {
        (r.query_id, r.maxsim_micros)
        for r in _run(spark, docs=[(3, "quick quick quick fox fox")]).collect()
    }
    got = {
        (r.query_id, r.maxsim_micros)
        for r in _run(spark, docs=twin).collect()
    }
    assert base == got


def test_maxsim_query_repeats_are_weighted(spark):
    """Query-side duplicates DO count per occurrence: 'dog dog' scores
    exactly twice 'dog' on every document."""
    one = {
        (r.query_id, r.doc_id): r.maxsim_micros
        for r in _run(spark, queries=[(1, "dog")]).collect()
    }
    two = {
        (r.query_id, r.doc_id): r.maxsim_micros
        for r in _run(spark, queries=[(1, "dog dog")]).collect()
    }
    assert set(one) == set(two)
    for key, v in one.items():
        assert two[key] == 2 * v


def test_maxsim_empty_inputs(spark):
    assert _run(spark, docs=[(5, "")]).count() == 0
    assert _run(spark, queries=[(9, "")]).count() == 0


def test_maxsim_validation(spark):
    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        token_vectors(ddf, "doc_id", "text", max_tokens=0)
    qdf = spark.createDataFrame(QUERIES, "query_id long, question string")
    dtok = token_vectors(ddf, "doc_id", "text", dim=16)
    qtok = query_token_weights(qdf, "query_id", "question", dim=16)
    with pytest.raises(ValueError, match="k must be"):
        maxsim_topk(dtok, qtok, k=0)
    with pytest.raises(ValueError, match="dim must be"):
        token_vectors(ddf, "doc_id", "text", dim=0)
    with pytest.raises(ValueError, match="dim must be"):
        query_token_weights(qdf, "query_id", "question", dim=-1)


def test_maxsim_plan_shape(spark):
    """Scale pins: the query-token side rides a BroadcastNestedLoopJoin
    (cross with broadcast build — the corpus never shuffles to meet the
    queries); every non-broadcast exchange is keyed (the two aggregates
    + the top-k window), none single-partition; the grouped top-k
    plans as WindowGroupLimit."""
    plan = (
        _run(spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    ex = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert ex and all("hashpartitioning(" in ln for ln in ex), plan
    assert "SinglePartition" not in plan, plan


def test_maxsim_rerank_matches_restricted_topk(spark):
    """Scoring a shortlist pair must equal the single-stage operator's
    score for the same (query, doc) — rerank is maxsim_topk restricted
    to the pairs, nothing else."""
    from lawlm_spark.operators.maxsim import maxsim_rerank

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, question string")
    dtok = token_vectors(ddf, "doc_id", "text", dim=16)
    qtok = query_token_weights(qdf, "query_id", "question", dim=16)
    full = {
        (r.query_id, r.doc_id): r.maxsim_micros
        for r in maxsim_topk(dtok, qtok, k=100).collect()
    }
    shortlist = spark.createDataFrame(
        [(10, 1), (10, 3), (11, 2), (11, 6)], "query_id long, doc_id long"
    )
    got = maxsim_rerank(shortlist, dtok, qtok, k=100).collect()
    assert {(r.query_id, r.doc_id) for r in got} == {
        (10, 1), (10, 3), (11, 2), (11, 6)
    }
    for r in got:
        assert r.maxsim_micros == full[(r.query_id, r.doc_id)]
    # ranks are dense within the shortlist
    assert sorted(r.rn for r in got if r.query_id == 10) == [1, 2]


def test_maxsim_rerank_validation_and_plan(spark):
    """Scale pins: BOTH small sides broadcast (the pair list on the doc
    key, the query tokens on the query key) — two BroadcastHashJoins,
    no shuffled join; every exchange keyed, none single-partition."""
    import pytest as _pytest

    from lawlm_spark.operators.maxsim import maxsim_rerank

    ddf = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id long, question string")
    dtok = token_vectors(ddf, "doc_id", "text", dim=16)
    qtok = query_token_weights(qdf, "query_id", "question", dim=16)
    shortlist = spark.createDataFrame(
        [(10, 1), (11, 2)], "query_id long, doc_id long"
    )
    with _pytest.raises(ValueError, match="k must be"):
        maxsim_rerank(shortlist, dtok, qtok, k=0)
    plan = (
        maxsim_rerank(shortlist, dtok, qtok, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    ex = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert ex and all("hashpartitioning(" in ln for ln in ex), plan
    assert "SinglePartition" not in plan, plan
