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


def test_ivfpq_partial_probe_recall_and_bounded_scan(spark):
    """The composed IVF-PQ quality path: KMeans cells, half probed,
    ADC candidates, exact re-rank — recall@5 floor vs brute L2, and the
    probed row count actually shrinks (the scan bound the composition
    exists for)."""
    from lawlm_spark.operators.ivf import ivfpq_topk
    from lawlm_spark.operators.pq import encode_pq, train_codebook

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    centroids = train_ivf_centroids(emb, "embedding", nlist=8)
    indexed = assign_cells(emb, "vec_id", "embedding", centroids).cache()
    book = train_codebook(emb, m=8, k=16, dim=64)
    codes = encode_pq(emb, book, m=8, dim=64)
    q = (
        emb.orderBy("vec_id").limit(3)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )

    got = ivfpq_topk(
        indexed, codes, centroids, book, q,
        k=5, nprobe=4, n_candidates=50, m=8, dim=64,
    ).collect()
    # exact L2 brute force for the same queries
    from lawlm_spark.operators.pq import _l2sq

    full = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qfull = F.transform(F.col("qvec"), lambda x: x.cast("double"))
    brute = (
        emb.crossJoin(q)
        .select("qid", "vec_id", _l2sq(qfull, full).alias("d"))
    )
    from lawlm_spark.operators.ranking import top_k

    exact = {
        (r["qid"], r["vec_id"])
        for r in top_k(brute, ["qid"], F.col("d").asc(), 5, tiebreak=["vec_id"]).collect()
    }
    hits = {(r["qid"], r["vec_id"]) for r in got}
    assert len(hits & exact) >= len(exact) * 0.6  # half the cells probed
    # every query's own vector is its nearest neighbor — must be rank 1
    for r in got:
        if r["rank"] == 1:
            assert r["vec_id"] == r["qid"] and r["dist"] == 0.0
    # scan bound: probing the 4 largest cells still reads strictly less
    # than the corpus — any actual probe set reads at most that much
    sizes = sorted(
        (r["c"] for r in indexed.groupBy("cell_id").agg(F.count("*").alias("c")).collect()),
        reverse=True,
    )
    assert len(sizes) == 8 and sum(sizes[:4]) < n
