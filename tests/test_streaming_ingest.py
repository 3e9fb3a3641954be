"""Streaming E1: incremental, restart-safe, idempotent mirror ingest."""

from __future__ import annotations

import tempfile

from lawlm_spark.streaming.ingest import stream_ingest_documents


def _mirror_keys(spark, mirror):
    return [r["chunk_key"] for r in spark.read.parquet(mirror).select("chunk_key").collect()]


def test_streaming_ingest_incremental_and_idempotent(spark, docs):
    base = tempfile.mkdtemp(prefix="stream_ingest_")
    landing, mirror, ckpt = base + "/landing", base + "/mirror", base + "/ckpt"

    # batch 1 lands: first 30 documents
    part1 = docs.filter("doc_id < 30")
    part1.write.parquet(landing)
    stream_ingest_documents(spark, landing, mirror, ckpt)
    keys1 = _mirror_keys(spark, mirror)
    assert len(keys1) > 0 and len(set(keys1)) == len(keys1)

    # batch 2 lands: 20 NEW documents plus 10 RE-LANDED ones (30-49 + 20-29)
    docs.filter("doc_id >= 20 and doc_id < 50").write.mode("append").parquet(landing)
    stream_ingest_documents(spark, landing, mirror, ckpt)
    keys2 = _mirror_keys(spark, mirror)
    assert len(set(keys2)) == len(keys2)  # re-landed docs deduped by chunk_key
    assert set(keys1) < set(keys2)  # strictly grew by the new docs' chunks

    # third run with no new files: the checkpointed file log skips everything
    stream_ingest_documents(spark, landing, mirror, ckpt)
    assert sorted(_mirror_keys(spark, mirror)) == sorted(keys2)

    # the mirror matches a straight batch ingest of the distinct documents
    from lawlm_spark.plans.rag import ingest_documents

    batch_chunks, _ = ingest_documents(
        docs.filter("doc_id < 50"), chunk_size=256, overlap=32, min_chunk=64
    )
    expected = {r["chunk_key"] for r in batch_chunks.select("chunk_key").collect()}
    assert set(keys2) == expected
