"""operators/topics.py: c-TF-IDF top terms per cluster."""

from __future__ import annotations

import math

from lawlm_spark.operators.topics import ctfidf_top_terms


def test_ctfidf_hand_case(spark):
    # cluster a: "cat cat dog", cluster b: "dog dog bird".
    # N=6, clusters=2, A=3.  f: cat=2, dog=3, bird=1.
    docs = spark.createDataFrame(
        [("a", "cat cat dog"), ("b", "dog dog bird")],
        "lang string, text string",
    )
    out = {
        (r["cluster"], r["term"]): (r["tf"], r["score"], r["rank"])
        for r in ctfidf_top_terms(docs, k=3).collect()
    }
    score = lambda tf, ft: round(tf * math.log(1 + 3.0 / ft), 6)
    assert out[("a", "cat")] == (2, score(2, 2), 1)  # distinctive to a
    assert out[("b", "bird")][1] == score(1, 1)
    # 'dog' appears in both clusters with a low idf
    assert out[("a", "dog")][1] == score(1, 3)
    assert out[("b", "dog")][1] == score(2, 3)


def test_shared_terms_rank_below_distinctive_ones(spark, docs):
    out = ctfidf_top_terms(docs.select("lang", "text"), k=5)
    rows = out.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert set(by_cluster) == {"en", "fr", "de", "es", "it"} & set(by_cluster) or by_cluster
    for cluster, terms in by_cluster.items():
        assert len(terms) == 5
        ranks = sorted(t["rank"] for t in terms)
        assert ranks == [1, 2, 3, 4, 5]


def test_token_drift_flags_the_shifted_vocabulary(spark):
    import math

    from lawlm_spark.operators.topics import token_drift

    a = spark.createDataFrame(
        [(1, "alpha alpha alpha beta"), (2, "alpha beta")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(3, "beta beta gamma"), (4, "gamma gamma beta")], "doc_id long, text string"
    )
    rows = token_drift(a, b, k=3).collect()
    assert rows[0]["term"] == "alpha"  # overrepresented in A, absent in B
    # hand-check the top contribution: c_a=4, c_b=0, N_a=6, N_b=6, V=3
    p_a, p_b = (4 + 1) / (6 + 3), (0 + 1) / (6 + 3)
    assert abs(rows[0]["contribution"] - round(p_a * math.log(p_a / p_b), 9)) < 1e-12
    assert [r["rank"] for r in rows] == [1, 2, 3]
    # gamma is B-heavy: its KL(A||B) contribution is negative -> ranked last
    assert rows[-1]["term"] == "gamma" and rows[-1]["contribution"] < 0


def test_token_drift_identical_corpora_contributes_zero(spark, docs):
    from lawlm_spark.operators.topics import token_drift

    half = docs.select("doc_id", "text").filter("doc_id < 100")
    rows = token_drift(half, half, k=10).collect()
    assert all(r["contribution"] == 0.0 for r in rows)
