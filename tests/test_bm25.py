"""BM25 featurization/scoring unit checks (the oracle certifies values;
these pin the algebraic properties and the map-form schema)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lawlm_spark.operators.bm25 import (
    bm25_index,
    bm25_score,
    bm25_score_queries,
    corpus_stats,
    postings_to_map,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark query engine for big data"),
            (2, "spark spark spark tuning"),
            (3, "completely unrelated gardening text"),
        ],
        ["id", "text"],
    )


def test_corpus_stats(spark):
    row = corpus_stats(_docs(spark), "text").collect()[0]
    assert row["n_docs"] == 3.0
    assert abs(row["avgdl"] - (6 + 4 + 4) / 3) < 1e-9


def test_idf_monotonic(spark):
    """Rarer terms weigh more; repeated tf saturates sublinearly."""
    idx = {(r["id"], r["term"]): r["weight"] for r in bm25_index(_docs(spark), "id", "text").collect()}
    assert idx[(3, "gardening")] > idx[(1, "spark")]  # df=1 beats df=2
    # tf=3 in doc2 scores higher than tf=1 in doc1 but < 3x (saturation)
    assert idx[(2, "spark")] > idx[(1, "spark")]
    assert idx[(2, "spark")] < 3 * idx[(1, "spark")]


def test_score_is_sum_of_weights(spark):
    idx = bm25_index(_docs(spark), "id", "text")
    scores = {r["id"]: r["bm25_score"] for r in bm25_score(idx, "id", ["spark", "engine"]).collect()}
    w = {(r["id"], r["term"]): r["weight"] for r in idx.collect()}
    assert math.isclose(scores[1], w[(1, "spark")] + w[(1, "engine")], rel_tol=1e-12)
    assert math.isclose(scores[2], w[(2, "spark")], rel_tol=1e-12)
    assert 3 not in scores


def test_batch_matches_single(spark):
    idx = bm25_index(_docs(spark), "id", "text")
    q = spark.createDataFrame([(7, "spark engine")], ["qid", "qtext"])
    batch = {r["id"]: r["bm25_score"] for r in bm25_score_queries(idx, "id", q, "qid", "qtext").collect()}
    single = {r["id"]: r["bm25_score"] for r in bm25_score(idx, "id", ["spark", "engine"]).collect()}
    assert batch == single


def test_postings_to_map_schema(spark):
    m = postings_to_map(bm25_index(_docs(spark), "id", "text"), "id")
    assert dict(m.dtypes)["bm25"] == "map<string,double>"
    rows = {r["id"]: r["bm25"] for r in m.collect()}
    assert set(rows[2].keys()) == {"spark", "tuning"}


# ------------------------------------------------------------- BM25F


def _bm25f_fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark query", "join join join filter scan"),
            (2, "filter scan", "spark spark query table window sort"),
            (3, "table sort", "window window group"),
        ],
        "doc_id long, title string, body string",
    )
    qs = spark.createDataFrame(
        [(0, "spark query"), (1, "window")], "query_id long, question string"
    )
    return docs, qs


def test_bm25f_matches_hand_computed(spark):
    """Full replication of the integer-exact BM25F algebra in pure
    python: tf~ = sum_f 4*w_f*S_f*tf_f/(S_f + 3*len_f*N) (the b=3/4
    rational multiplied through), idf over whole-doc df, per-term
    centi-quantized weight summed as int64."""
    import math

    from lawlm_spark.operators.bm25 import bm25f_topk

    docs, qs = _bm25f_fixture(spark)
    out = bm25f_topk(
        docs, qs, "doc_id", "title", "body", "query_id", "question", k=3
    )
    got = sorted(
        (r["query_id"], r["doc_id"], r["bm25f_cents"], r["rn"])
        for r in out.collect()
    )
    corpus = {
        1: (["spark", "query"], ["join", "join", "join", "filter", "scan"]),
        2: (["filter", "scan"], ["spark", "spark", "query", "table", "window", "sort"]),
        3: (["table", "sort"], ["window", "window", "group"]),
    }
    S_t = sum(len(t) for t, _ in corpus.values())
    S_b = sum(len(b) for _, b in corpus.values())
    N = len(corpus)

    def score(qterms, d):
        t, b = corpus[d]
        s = 0
        for term in dict.fromkeys(qterms):
            df = sum(1 for tt, bb in corpus.values() if term in tt or term in bb)
            if term not in t and term not in b:
                continue
            tfw = 0.0
            if t.count(term):
                tfw += (4 * 2 * S_t * t.count(term)) / (S_t + 3 * len(t) * N)
            if b.count(term):
                tfw += (4 * 1 * S_b * b.count(term)) / (S_b + 3 * len(b) * N)
            idf = math.log((N - df + 0.5) / (df + 0.5) + 1)
            s += round(round(idf * tfw / (1.2 + tfw), 4) * 100)
        return s

    want = []
    for q, terms in [(0, ["spark", "query"]), (1, ["window"])]:
        hits = sorted(
            ((d, score(terms, d)) for d in corpus if score(terms, d)),
            key=lambda x: (-x[1], x[0]),
        )
        want += [(q, d, s, rn) for rn, (d, s) in enumerate(hits[:3], 1)]
    assert got == sorted(want)


def test_bm25f_title_hit_outranks_body_hit(spark):
    """The field story: the SAME term with the SAME tf ranks the doc
    with the TITLE hit first (w_title > w_body and the short title's
    length normalization amplifies it) — a weighted sum of per-field
    BM25 scores post-saturation could not distinguish the pair this
    sharply; BM25F folds the weight into tf~ pre-saturation."""
    from lawlm_spark.operators.bm25 import bm25f_topk

    docs = spark.createDataFrame(
        [
            (1, "needle alpha", "beta gamma delta"),
            (2, "alpha beta", "needle gamma delta"),
        ],
        "doc_id long, title string, body string",
    )
    qs = spark.createDataFrame([(0, "needle")], "query_id long, question string")
    out = bm25f_topk(
        docs, qs, "doc_id", "title", "body", "query_id", "question", k=2
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rn"])]
    assert ranked == [1, 2]


def test_bm25f_plan_broadcast_only(spark):
    """No corpus-sized join side: stats and query terms broadcast, the
    keyed exchanges are the posting/df/score aggregates, top-k is a
    WindowGroupLimit."""
    from lawlm_spark.operators.bm25 import bm25f_topk

    docs, qs = _bm25f_fixture(spark)
    plan = (
        bm25f_topk(docs, qs, "doc_id", "title", "body", "query_id", "question")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert node not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_bm25f_empty_field_and_missing_term(spark):
    """A doc with an empty title still scores through the body field
    (its zero title length joins the S_t stat, not a NULL), and terms
    absent from both fields contribute nothing."""
    from lawlm_spark.operators.bm25 import bm25f_topk

    docs = spark.createDataFrame(
        [(1, "", "needle gamma"), (2, "needle x", "y z")],
        "doc_id long, title string, body string",
    )
    qs = spark.createDataFrame(
        [(0, "needle zzz_absent")], "query_id long, question string"
    )
    out = bm25f_topk(
        docs, qs, "doc_id", "title", "body", "query_id", "question", k=5
    ).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    assert all(r["bm25f_cents"] > 0 for r in out)
