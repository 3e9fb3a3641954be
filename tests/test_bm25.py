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
