"""operators/rerank.pairwise_rerank + operators/bm25.rm3_expand_topk:
the r16 retrieval-quality surfaces (VERDICT r15 item 6a/6c)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.bm25 import bm25_index, bm25_score_queries, rm3_expand_topk
from lawlm_spark.operators.ranking import top_k
from lawlm_spark.operators.rerank import pairwise_rerank

DOCS_SCHEMA = "doc_id long, text string"
Q_SCHEMA = "query_id long, question string"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffles data between stages during wide joins"),
            (2, "the fast table scan avoids every join and shuffle"),
            (3, "join join join table"),  # tf-heavy, low diversity
            (4, "scan the fast fast table"),
            (5, "unrelated cooking recipe with olive oil and basil"),
            (6, "fast scan join table stream"),  # high overlap
        ],
        DOCS_SCHEMA,
    )


def _qs(spark):
    return spark.createDataFrame([(0, "fast table scan join")], Q_SCHEMA)


# ---------------------------------------------------------------- rerank


def test_rerank_orders_by_token_overlap(spark):
    docs, qs = _docs(spark), _qs(spark)
    short = spark.createDataFrame(
        [(0, d) for d in (1, 2, 3, 4, 5, 6)], "query_id long, doc_id long"
    )
    out = pairwise_rerank(short, docs, qs, k=6).collect()
    got = [(r["doc_id"], r["rerank_micros"]) for r in out]
    # hand-computed (Q = {fast, table, scan, join}):
    # d6 toks {fast,scan,join,table,stream}: inter 4, union 5 -> 800000
    # d2 {the,fast,table,scan,avoids,every,join,and,shuffle}: 4/9 -> 444444
    # d4 {scan,the,fast,table}: 3/5 -> 600000
    # d3 {join,table}: 2/4 -> 500000
    # d1 {spark,shuffles,data,between,stages,during,wide,joins}: 0/12 -> 0
    # d5: 0 -> 0
    assert got[0] == (6, 800000)
    assert got[1] == (4, 600000)
    assert got[2] == (3, 500000)
    assert got[3] == (2, 444444)
    # zero-overlap ties break by doc id ascending
    assert [g[0] for g in got[4:]] == [1, 5]
    assert all(g[1] == 0 for g in got[4:])


def test_rerank_scores_only_shortlisted_pairs(spark):
    docs, qs = _docs(spark), _qs(spark)
    short = spark.createDataFrame([(0, 2), (0, 5)], "query_id long, doc_id long")
    out = pairwise_rerank(short, docs, qs, k=10).collect()
    assert sorted(r["doc_id"] for r in out) == [2, 5]


def test_rerank_pandas_scorer_hook(spark):
    """The cross-encoder hook: an arbitrary python pair-scorer runs as a
    pandas UDF over the identical plan and reorders the result."""
    import pandas as pd

    docs, qs = _docs(spark), _qs(spark)
    short = spark.createDataFrame(
        [(0, d) for d in (1, 2, 3)], "query_id long, doc_id long"
    )

    def reverse_length_scorer(q_texts: pd.Series, d_texts: pd.Series) -> pd.Series:
        return -d_texts.str.len().astype("float64")

    out = pairwise_rerank(short, docs, qs, k=3, scorer=reverse_length_scorer)
    got = [r["doc_id"] for r in out.collect()]
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = sorted((len(texts[d]), d) for d in (1, 2, 3))
    assert got == [d for _, d in want]


def test_rerank_nonfinite_scorer_raises_instead_of_ranking(spark):
    """ADVICE r16 (+ r17 review): NaN and +/-inf pairwise scores must
    raise the DESCRIPTIVE guard before quantization — under non-ANSI
    they would silently saturate (inf -> Long.MAX ranks first), under
    ANSI the raw cast error carries no context."""
    import math

    import pandas as pd

    docs, qs = _docs(spark), _qs(spark)
    short = spark.createDataFrame(
        [(0, d) for d in (1, 2, 3)], "query_id long, doc_id long"
    )

    for bad in (math.nan, math.inf, -math.inf):
        def bad_scorer(q_texts, d_texts, _v=bad):
            return pd.Series([_v] * len(d_texts), dtype="float64")

        out = pairwise_rerank(short, docs, qs, k=3, scorer=bad_scorer)
        with pytest.raises(Exception) as ei:
            out.collect()
        assert "pairwise_rerank: scorer returned" in str(ei.value), bad

    # the guard references the UDF output four times — they must
    # collapse to ONE Arrow evaluation, not four scorings per row
    def ok_scorer(q_texts, d_texts):
        return d_texts.str.len().astype("float64")

    plan = (
        pairwise_rerank(short, docs, qs, k=3, scorer=ok_scorer)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


def test_rerank_plan_broadcasts_and_single_topk_exchange(spark):
    docs, qs = _docs(spark), _qs(spark)
    short = spark.createDataFrame([(0, 1), (0, 2)], "query_id long, doc_id long")
    plan = (
        pairwise_rerank(short, docs, qs, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus side must meet the shortlist via broadcast, never a
    # shuffled join
    assert "BroadcastHashJoin" in plan, plan
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert node not in plan, plan
    assert "WindowGroupLimit" in plan, plan


# ---------------------------------------------------------------- RM3


def _corpus(spark):
    # vocabulary-mismatch setup: relevant docs share "columnar" with the
    # first-pass hits but not with the query itself
    return spark.createDataFrame(
        [
            (1, "fast scan of the table uses columnar layout"),
            (2, "fast table scan with columnar compression"),
            (3, "columnar storage accelerates analytics"),  # no query term!
            (4, "row oriented storage is slower for scans"),
            (5, "cooking with olive oil and basil leaves"),
            (6, "fast cars drive on the highway"),
        ],
        DOCS_SCHEMA,
    )


def test_rm3_expansion_lifts_vocabulary_mismatch_doc(spark):
    docs = _corpus(spark)
    qs = spark.createDataFrame([(0, "fast table scan")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    base = top_k(
        bm25_score_queries(idx, "doc_id", qs, "query_id", "question"),
        ["query_id"], F.col("bm25_score").desc(), 6, tiebreak=["doc_id"],
    )
    base_ids = {r["doc_id"] for r in base.collect()}
    assert 3 not in base_ids  # shares no term with the raw query

    out = rm3_expand_topk(idx, qs, k_fb=2, m_terms=4, k=6)
    rm3_ids = {r["doc_id"] for r in out.collect()}
    # "columnar" rides in from the d1/d2 feedback docs and retrieves d3
    assert 3 in rm3_ids


def test_rm3_interpolation_keeps_original_query_dominant(spark):
    """alpha < 1: a pure-expansion doc must not outrank a doc matching
    the original query well."""
    docs = _corpus(spark)
    qs = spark.createDataFrame([(0, "fast table scan")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    out = rm3_expand_topk(idx, qs, k_fb=2, m_terms=4, k=6).collect()
    ranks = {r["doc_id"]: r["rn"] for r in out}
    assert ranks[2] < ranks[3]
    assert ranks[1] < ranks[3]


def test_rm3_no_feedback_degrades_to_first_pass(spark):
    """A query matching nothing still returns (empty) instead of
    crashing, and a query whose terms match keeps its own results even
    when another query in the batch matches nothing."""
    docs = _corpus(spark)
    qs = spark.createDataFrame(
        [(0, "fast table scan"), (1, "zzz qqq www")], Q_SCHEMA
    )
    idx = bm25_index(docs, "doc_id", "text")
    out = rm3_expand_topk(idx, qs, k_fb=2, m_terms=4, k=6).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q.get(0, [])) > 0
    assert 1 not in by_q  # no posting matches any term -> empty, not error


def test_rm3_alpha_validation(spark):
    docs, qs = _corpus(spark), _qs(spark)
    idx = bm25_index(docs, "doc_id", "text")
    with pytest.raises(ValueError, match="alpha"):
        rm3_expand_topk(idx, qs, alpha_num=10, alpha_den=10)
    with pytest.raises(ValueError, match="alpha"):
        rm3_expand_topk(idx, qs, alpha_num=0, alpha_den=10)


def test_rm3_overflow_raises_instead_of_wrapping(spark):
    """ADVICE r16: the integer chain must fail DESCRIPTIVELY on a
    pathological weight_scale — the guard's message, not a raw
    ARITHMETIC_OVERFLOW (ANSI on, this runtime's default) and never a
    silent wrap (ANSI off)."""
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    docs, qs = _corpus(spark), _qs(spark)
    idx = bm25_index(docs, "doc_id", "text")
    out = rm3_expand_topk(idx, qs, k=3, weight_scale=10**14)
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)) as ei:
        out.collect()
    assert "int64-safe bound" in str(ei.value)


def test_rm3_plan_no_corpus_shuffle_joins(spark):
    """Corpus-touching joins must all be broadcast; the only exchanges
    are the keyed aggregates and top-k boundaries."""
    docs, qs = _corpus(spark), _qs(spark)
    idx = bm25_index(docs, "doc_id", "text")
    plan = (
        rm3_expand_topk(idx, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # query-side smalls are broadcast-hinted, so no shuffled join
    # anywhere in the plan
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert node not in plan, plan


# ---------------------------------------------------------------- SDM


def test_sdm_phrase_beats_scattered_terms(spark):
    """The MRF ordered-bigram feature: identical bags of words, but the
    exact-phrase document wins."""
    from lawlm_spark.operators.bm25 import sdm_bigram_topk

    docs = spark.createDataFrame(
        [
            (1, "the fast scan runs and the table waits somewhere else"),
            (2, "the fast scan of the fast table helps"),
            (3, "fast table scan here and a fast table scan there"),
            (4, "cooking with basil"),
        ],
        DOCS_SCHEMA,
    )
    qs = spark.createDataFrame([(0, "fast table scan")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    out = sdm_bigram_topk(idx, docs, qs, k=4).collect()
    ranks = {r["doc_id"]: r["rn"] for r in out}
    # d3 has BOTH query bigrams twice each; d1 has the terms but no
    # adjacency; d2 has "fast table" only
    assert ranks[3] == 1
    assert ranks[3] < ranks[2] < ranks[1]
    assert 4 not in ranks or ranks[4] == max(ranks.values())


def test_sdm_single_token_query_is_pure_unigram(spark):
    from lawlm_spark.operators.bm25 import bm25_score_queries, sdm_bigram_topk

    docs = _corpus(spark)
    qs = spark.createDataFrame([(0, "columnar")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    sdm = sdm_bigram_topk(idx, docs, qs, k=6, w_unigram=1, w_bigram=999)
    base = bm25_score_queries(idx, "doc_id", qs, "query_id", "question")
    got = [r["doc_id"] for r in sdm.collect()]
    want = sorted(
        ((-r["bm25_score"], r["doc_id"]) for r in base.collect())
    )
    assert got == [d for _, d in want]  # bigram weight never fires


def test_sdm_short_docs_no_crash(spark):
    from lawlm_spark.operators.bm25 import sdm_bigram_topk

    docs = spark.createDataFrame(
        [(1, "fast"), (2, ""), (3, "fast table")], DOCS_SCHEMA
    )
    qs = spark.createDataFrame([(0, "fast table")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    out = sdm_bigram_topk(idx, docs, qs, k=3).collect()
    ranks = {r["doc_id"]: r["rn"] for r in out}
    assert ranks[3] == 1  # unigrams + the exact bigram
    assert 2 not in ranks  # empty doc never scores


def test_sdm_plan_broadcast_only_corpus_joins(spark):
    from lawlm_spark.operators.bm25 import sdm_bigram_topk

    docs, qs = _corpus(spark), _qs(spark)
    idx = bm25_index(docs, "doc_id", "text")
    plan = (
        sdm_bigram_topk(idx, docs, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert node not in plan, plan
    assert "WindowGroupLimit" in plan, plan


# ------------------------------------------------ full SDM (r17 surface)


def test_sdm_window_counts_cooccurrence_within_window(spark):
    """The unordered-window feature: terms within `window` positions in
    EITHER order score; beyond the window they don't."""
    from lawlm_spark.operators.bm25 import sdm_window_topk

    docs = spark.createDataFrame(
        [
            # "scan table" reversed within window 8 -> 1 uw pair
            (1, "scan of the big table"),
            # terms 9 positions apart -> outside window 8, no uw hit
            (2, "table a b c d e f g h scan"),
            (3, "nothing relevant here"),
        ],
        DOCS_SCHEMA,
    )
    qs = spark.createDataFrame([(0, "table scan")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    # isolate the window feature: zero out the other two
    out = sdm_window_topk(
        idx, docs, qs, k=3, w_unigram=0, w_bigram=0, w_window=1, window=8
    ).collect()
    scores = {r["doc_id"]: r["sdm_score"] for r in out}
    assert scores[1] == 1
    assert scores.get(2, 0) == 0


def test_sdm_window_count_is_all_position_pairs(spark):
    """uw(d,a,b) counts every (pos_a, pos_b) pair inside the window —
    the positional-join semantics the oracle replays."""
    from lawlm_spark.operators.bm25 import sdm_window_topk

    docs = spark.createDataFrame(
        [(1, "table scan table scan")], DOCS_SCHEMA
    )
    qs = spark.createDataFrame([(0, "table scan")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    out = sdm_window_topk(
        idx, docs, qs, k=1, w_unigram=0, w_bigram=0, w_window=1, window=8
    ).collect()
    # positions: table@1,3 scan@2,4 -> 2x2 = 4 pairs, all within 8
    assert out[0]["sdm_score"] == 4


def test_sdm_window_degenerate_same_term_pair_excluded(spark):
    """Adjacent repeated tokens ('scan scan') canonicalize to a == b
    and are excluded (documented) — no self-pair explosion."""
    from lawlm_spark.operators.bm25 import sdm_window_topk

    docs = spark.createDataFrame([(1, "scan scan scan")], DOCS_SCHEMA)
    qs = spark.createDataFrame([(0, "scan scan")], Q_SCHEMA)
    idx = bm25_index(docs, "doc_id", "text")
    out = sdm_window_topk(
        idx, docs, qs, k=1, w_unigram=0, w_bigram=0, w_window=1, window=8
    ).collect()
    # the unigram branch still emits its (zero-weighted) rows; the
    # window branch must contribute nothing
    assert all(r["sdm_score"] == 0 for r in out)


def test_sdm_window_reduces_to_bigram_form_when_weight_zero(spark):
    """w_window=0 must reproduce sdm_bigram_topk exactly (the two-
    feature form is the three-feature form's projection)."""
    from lawlm_spark.operators.bm25 import sdm_bigram_topk, sdm_window_topk

    docs, qs = _corpus(spark), _qs(spark)
    idx = bm25_index(docs, "doc_id", "text")
    two = {
        (r["query_id"], r["doc_id"]): (r["sdm_score"], r["rn"])
        for r in sdm_bigram_topk(idx, docs, qs, k=5).collect()
    }
    three = {
        (r["query_id"], r["doc_id"]): (r["sdm_score"], r["rn"])
        for r in sdm_window_topk(idx, docs, qs, k=5, w_window=0).collect()
    }
    assert two == three


def test_sdm_window_plan_broadcast_only_corpus_joins(spark):
    """All three corpus branches must join broadcast-side only — the
    positional partner lookup is element_at on the same row's map, so
    no positional self-join ever shuffles."""
    from lawlm_spark.operators.bm25 import sdm_window_topk

    docs, qs = _corpus(spark), _qs(spark)
    idx = bm25_index(docs, "doc_id", "text")
    plan = (
        sdm_window_topk(idx, docs, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # (bm25_index's single-row corpus-stats crossJoin is a benign
    # BroadcastNestedLoopJoin — same allowance as the sdm_bigram test)
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert node not in plan, plan
    assert "WindowGroupLimit" in plan, plan
