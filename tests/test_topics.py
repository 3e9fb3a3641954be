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
