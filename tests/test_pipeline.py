"""E1/E2 pipeline invariants: the reference's chunk-key uniqueness test
(tests/test_duplicates.py:95-179) ported, plus ingest idempotence and
RAG determinism."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from lawlm_spark.operators.relational import dup_audit
from lawlm_spark.plans.rag import hybrid_search, ingest_documents, rag_answer
from lawlm_spark.sources.mirror import mirror_stats, scan_mirror, write_mirror


def _queries(spark):
    return spark.createDataFrame(
        [(1, "fast table scan join"), (2, "window agg stream")], ["query_id", "question"]
    )


def _hits(df):
    return sorted(
        (r["query_id"], r["chunk_key"], round(r["fused_score"], 6), r["final_rank"])
        for r in df.collect()
    )


def test_hybrid_ann_exhaustive_probe_matches_brute(spark, docs):
    """dense_retriever='rp_lsh' with num_planes=1 + multiprobe probes both
    buckets -> recall 1 by construction -> identical fused results to the
    brute-force composition, while executing the bucketed plan."""
    chunks, postings = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    queries = _queries(spark)
    brute = hybrid_search(chunks, postings, queries, k=3)
    ann = hybrid_search(
        chunks, postings, queries, k=3,
        dense_retriever="rp_lsh",
        retriever_opts={"num_planes": 1, "probe_hamming": 1},
    )
    assert _hits(ann) == _hits(brute)


def test_hybrid_ivf_full_probe_matches_brute(spark, docs):
    """dense_retriever='ivf' probing every cell (nprobe >= nlist) is also
    exhaustive -> identical results; certifies the prebuilt-index path
    (index once, query many — the 100 TB shape)."""
    from lawlm_spark.operators.ivf import assign_cells, train_ivf_centroids

    chunks, postings = ingest_documents(docs.limit(60), chunk_size=256, overlap=32, min_chunk=64)
    queries = _queries(spark)
    centroids = train_ivf_centroids(chunks, "embedding", nlist=4)
    indexed = assign_cells(chunks, "chunk_key", "embedding", centroids)
    brute = hybrid_search(chunks, postings, queries, k=3)
    ann = hybrid_search(
        chunks, postings, queries, k=3,
        dense_retriever="ivf",
        retriever_opts={"centroids": centroids, "indexed": indexed, "nprobe": 4},
    )
    assert _hits(ann) == _hits(brute)


def test_hybrid_ann_recall_at_defaults(spark, docs):
    """At the shipped rp_lsh defaults (derived planes + multiprobe) the
    ANN composition must keep most of the brute top-k per query."""
    chunks, postings = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    n = chunks.count()
    queries = _queries(spark)
    brute = {(r[0], r[1]) for r in _hits(hybrid_search(chunks, postings, queries, k=3))}
    ann = {
        (r[0], r[1])
        for r in _hits(
            hybrid_search(
                chunks, postings, queries, k=3,
                dense_retriever="rp_lsh", retriever_opts={"n_vectors": n},
            )
        )
    }
    # BM25 branch is identical; only dense candidates can drop, so the
    # fused top-3 overlap stays high
    assert len(ann & brute) / len(brute) >= 0.6


def test_hybrid_unknown_retriever_raises(spark, docs):
    import pytest

    chunks, postings = ingest_documents(docs.limit(5), chunk_size=256, overlap=32, min_chunk=64)
    with pytest.raises(ValueError, match="unknown dense_retriever"):
        hybrid_search(chunks, postings, _queries(spark), dense_retriever="hnsw")


def test_cache_registry_exposes_persisted_handles(spark, docs):
    """ADVICE r3: eager persists leak in long-lived sessions unless the
    caller gets the handles back to unpersist after its final action."""
    from lawlm_spark.plans.curation import curate_documents

    registry = []
    out = curate_documents(docs.limit(40), cache_registry=registry)
    out.count()  # final consuming action
    assert registry, "expected persisted intermediates to be registered"
    assert all(df.storageLevel.useMemory or df.storageLevel.useDisk for df in registry)
    for df in registry:
        df.unpersist(blocking=True)
    assert all(not df.storageLevel.useMemory for df in registry)

    registry2 = []
    chunks, _ = ingest_documents(
        docs.limit(20), chunk_size=256, overlap=32, min_chunk=64,
        eager_share=True, cache_registry=registry2,
    )
    chunks.count()
    assert len(registry2) == 1
    registry2[0].unpersist(blocking=True)


def test_chunk_key_uniqueness_invariant(spark, docs):
    """Reference invariant: chunk id unique, parent doc ids repeat
    (test_duplicates.py:125-130, assert at 177-179)."""
    chunks, _ = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    assert dup_audit(chunks, ["chunk_key"]).count() == 0
    assert dup_audit(chunks, ["point_id"]).count() == 0
    assert chunks.select("doc_id").distinct().count() < chunks.count()  # docs repeat


def test_ingest_idempotent(spark, docs):
    """Running ingest twice produces the identical index (deterministic
    keys -> idempotent upsert, SURVEY.md §4)."""
    a, _ = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    b, _ = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    sel = lambda d: sorted(
        map(tuple, d.select("chunk_key", "point_id", "chunk_text").collect())
    )
    assert sel(a) == sel(b)


def test_rag_deterministic_under_repartition(spark, docs):
    q = _queries(spark)
    chunks, postings = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    r1 = sorted(map(tuple, rag_answer(chunks, postings, q).collect()))
    chunks2, postings2 = ingest_documents(
        docs.repartition(7), chunk_size=256, overlap=32, min_chunk=64
    )
    r2 = sorted(map(tuple, rag_answer(chunks2, postings2, q).collect()))
    assert r1 == r2


def test_hybrid_search_returns_k(spark, docs):
    chunks, postings = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    hits = hybrid_search(chunks, postings, _queries(spark), k=3)
    per_query = hits.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in per_query) and per_query


def test_mirror_roundtrip(spark, docs):
    chunks, _ = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    path = tempfile.mkdtemp(prefix="mirror_test_") + "/index"
    write_mirror(chunks.drop("embedding"), path)
    back = scan_mirror(spark, path)
    assert back.count() == chunks.count()
    stats = mirror_stats(back, "point_id").collect()[0]
    assert stats["points_count"] == stats["distinct_keys"] == chunks.count()


def test_hybrid_pq_exhaustive_candidates_match_brute(spark, docs):
    """dense_retriever='pq' with n_candidates >= corpus size re-ranks
    every chunk exactly -> identical fused results to brute, while
    executing the compressed-codes candidate plan (ADC scan + exact
    re-rank of candidates only)."""
    chunks, postings = ingest_documents(docs.limit(60), chunk_size=256, overlap=32, min_chunk=64)
    queries = _queries(spark)
    n = chunks.count()
    brute = hybrid_search(chunks, postings, queries, k=3)
    pq = hybrid_search(
        chunks, postings, queries, k=3,
        dense_retriever="pq",
        retriever_opts={"n_candidates": n},
    )
    assert _hits(pq) == _hits(brute)
