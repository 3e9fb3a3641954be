"""IVF ANN: assignment sanity + recall against brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.functions.vectors import fake_embedding
from lawlm_spark.operators.ivf import assign_cells, ivf_topk, train_ivf_centroids
from lawlm_spark.operators.similarity import brute_force_topk
from lawlm_spark.sources.testdata import load_table


def test_ivf_index_and_recall(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    centroids = train_ivf_centroids(emb, "embedding", nlist=8)
    assert centroids.count() == 8

    indexed = assign_cells(emb, "vec_id", "embedding", centroids).cache()
    assert indexed.count() == emb.count()  # every vector lands in one cell
    assert indexed.select("cell_id").distinct().count() > 1

    q = spark.createDataFrame(
        [(i, f"ivf probe {i}") for i in range(4)], ["query_id", "question"]
    ).select("query_id", fake_embedding(F.col("question"), 64).alias("q_vec"))

    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, q, "vec_id", "embedding", "query_id", "q_vec", k=5).collect()
    }
    got = ivf_topk(indexed, centroids, q, "vec_id", "embedding", "query_id", "q_vec",
                   k=5, nprobe=4).collect()
    hits = {(r["query_id"], r["vec_id"]) for r in got}
    # probing half the cells must recover a solid share of the true top-5
    assert len(hits & exact) >= len(exact) * 0.5
    # cosines are exact (re-ranked), so any overlap carries true scores
    brute_scores = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in brute_force_topk(emb, q, "vec_id", "embedding", "query_id", "q_vec", k=500).collect()
    }
    for r in got:
        assert abs(brute_scores[(r["query_id"], r["vec_id"])] - r["cos"]) < 1e-9


def test_ivf_full_probe_equals_exact(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    centroids = train_ivf_centroids(emb, "embedding", nlist=4)
    indexed = assign_cells(emb, "vec_id", "embedding", centroids)
    q = spark.createDataFrame([(0, "total recall")], ["query_id", "question"]).select(
        "query_id", fake_embedding(F.col("question"), 64).alias("q_vec")
    )
    exact = brute_force_topk(emb, q, "vec_id", "embedding", "query_id", "q_vec", k=10)
    full = ivf_topk(indexed, centroids, q, "vec_id", "embedding", "query_id", "q_vec",
                    k=10, nprobe=4)  # nprobe == nlist -> no pruning
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, full.collect()))
