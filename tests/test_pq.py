"""Product quantization (operators/pq.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.pq import (
    adc_topk,
    encode_pq,
    encode_pq_expr,
    seed_codebook,
    train_codebook,
)

M, K, DIM = 8, 16, 64


@pytest.fixture(scope="module")
def vecs(spark):
    from lawlm_spark.sources.testdata import load_table

    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


@pytest.fixture(scope="module")
def book(vecs):
    return seed_codebook(vecs, m=M, k=K, dim=DIM).cache()


def test_codebook_shape(book):
    rows = book.collect()
    assert len(rows) == M * K
    assert {(r["sub"], r["code"]) for r in rows} == {
        (s, c) for s in range(M) for c in range(K)
    }
    assert all(len(r["centroid"]) == DIM // M for r in rows)


def test_seed_vectors_encode_to_themselves(vecs, book):
    # the k lowest-id vectors ARE the centroids: vector with rank r must
    # encode to code r in every subspace (distance exactly 0)
    codes = encode_pq(vecs.orderBy("vec_id").limit(K), book, m=M, dim=DIM).collect()
    rank = {r["vec_id"]: i for i, r in enumerate(
        vecs.orderBy("vec_id").limit(K).select("vec_id").collect())}
    for r in codes:
        assert r["code"] == rank[r["vec_id"]]


def test_expr_encode_matches_relational(vecs, book):
    rel = (
        encode_pq(vecs, book, m=M, dim=DIM)
        .groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc"))
        .select("vec_id", F.transform("sc", lambda s: s["code"]).alias("codes"))
    )
    rows = [(r["sub"], r["code"], r["centroid"]) for r in book.collect()]
    ex = encode_pq_expr(vecs, rows, m=M, dim=DIM)
    diff = rel.join(ex.withColumnRenamed("codes", "codes2"), "vec_id").filter(
        F.col("codes") != F.col("codes2")
    )
    assert diff.count() == 0


def test_expr_encode_is_map_only(vecs, book):
    rows = [(r["sub"], r["code"], r["centroid"]) for r in book.collect()]
    plan = (
        encode_pq_expr(vecs, rows, m=M, dim=DIM)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_adc_topk_deterministic_and_selfmatch(vecs, book):
    codes = encode_pq(vecs, book, m=M, dim=DIM)
    queries = (
        vecs.orderBy("vec_id").limit(3)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    got = adc_topk(queries, codes, book, topk=5, m=M, dim=DIM).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {0, 1, 2} and all(len(v) == 5 for v in by_q.values())
    # a seed query's quantization error is 0, so it must rank itself first
    for qid, rows in by_q.items():
        top = min(rows, key=lambda r: r["rank"])
        assert top["vec_id"] == qid and top["adist"] == 0.0


def test_trained_codebook_candidate_recall(spark, vecs):
    # the production contract: ADC is the CANDIDATE GENERATOR (top-50
    # from compressed codes), exact re-rank recovers the true order —
    # so the bar is candidate recall of the exact top-10, not direct
    # ADC@10 (PQ distance error makes that genuinely lossy)
    book = train_codebook(vecs, m=M, k=64, dim=DIM, seed=7)
    codes = encode_pq(vecs, book, m=M, dim=DIM)
    probes = (
        vecs.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )
    approx = adc_topk(probes, codes, book, topk=51, m=M, dim=DIM)

    v = vecs.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    exact = (
        probes.crossJoin(v)
        .select(
            "qid",
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.transform("qvec", lambda x: x.cast("double")),
                    F.col("e"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        .withColumn("rank", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("qid").orderBy("d", "vec_id")))
        .filter(F.col("rank") <= 11)
    )
    a = {(r["qid"], r["vec_id"]) for r in approx.collect() if r["qid"] != r["vec_id"]}
    e = {(r["qid"], r["vec_id"]) for r in exact.collect() if r["qid"] != r["vec_id"]}
    recall = len(a & e) / len(e)
    assert recall >= 0.8, recall  # measured 0.94 at m=8,k=64,R=50

    # and the re-ranked pipeline returns exactly the exact top-k for
    # every candidate it kept (exact math on candidates, same tiebreak)
    from lawlm_spark.operators.pq import adc_rerank_topk

    rr = adc_rerank_topk(
        probes, codes, book, vecs, topk=10, n_candidates=51, m=M, dim=DIM
    )
    rr_pairs = {(r["qid"], r["vec_id"]) for r in rr.collect()}
    exact10 = {
        (r["qid"], r["vec_id"]) for r in exact.collect() if r["rank"] <= 10
    }
    assert len(rr_pairs & exact10) / len(exact10) >= 0.8


def test_codebook_parquet_roundtrip(spark, vecs, book, tmp_path):
    path = str(tmp_path / "pq_book")
    book.write.mode("overwrite").parquet(path)
    loaded = spark.read.parquet(path)
    before = encode_pq(vecs, book, m=M, dim=DIM)
    after = encode_pq(vecs, loaded, m=M, dim=DIM)
    assert before.exceptAll(after).count() == 0 and after.exceptAll(before).count() == 0
