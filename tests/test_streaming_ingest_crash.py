"""v37 crash-safety: kill the near-dup streaming ingest mid-micro-batch
and prove the checkpointed replay heals per table (VERDICT r5 #5).

The protocol under test (streaming/ingest.py::_neardup_judge_batch):
verdict is forced BEFORE any index mutation, chunks are written BEFORE
the index append, and the index append heals per table (shingles first,
bands second; each append anti-joins the ids the table already has).
The two crash points a foreachBatch replay must survive:

  crash=shingles — chunks written, index untouched.  Replay recomputes
      the identical verdict (index unchanged), the chunk-key anti-join
      dedups the re-written chunks to nothing, and the append completes.
  crash=bands — chunks written, shingles appended, bands NOT.  The
      half-indexed docs are shingles-without-bands: invisible to
      candidate generation (candidates come from band-key matches), so
      the replay cannot self-match the batch against its own half-row
      and drop it.  The append heals: shingles anti-join skips the
      already-present ids, bands append completes.

The kill is injected by making the index-append write throw (the
foreachBatch fails, the streaming query dies, the file-source offset
never commits), then the query is restarted unpatched with the SAME
checkpoint — exactly the replay a task/executor loss produces.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

import lawlm_spark.streaming.ingest as ingest_mod
from lawlm_spark.plans.rag import ingest_documents
from lawlm_spark.sources.mirror import write_mirror
from lawlm_spark.streaming.ingest import stream_ingest_documents


def _mirror_ids(spark, mirror):
    return {
        r["doc_id"]
        for r in spark.read.parquet(mirror).select("doc_id").distinct().collect()
    }


def _chunk_keys(spark, mirror):
    return [r["chunk_key"] for r in spark.read.parquet(mirror).select("chunk_key").collect()]


@pytest.mark.parametrize("crash_on", ["shingles", "bands"])
def test_neardup_ingest_survives_mid_batch_kill(spark, docs, monkeypatch, crash_on):
    base = tempfile.mkdtemp(prefix=f"stream_crash_{crash_on}_")
    landing, mirror, ckpt = base + "/landing", base + "/mirror", base + "/ckpt"
    index = mirror + "_neardup_index"

    # wave 1: originals land cleanly
    wave1 = docs.filter("doc_id < 15").select("doc_id", "text")
    wave1.write.parquet(landing)
    stream_ingest_documents(spark, landing, mirror, ckpt, near_dup_jaccard=0.5)
    keys1 = _chunk_keys(spark, mirror)

    # wave 2: near-dup copies of wave 1 (new ids, must be dropped) + fresh
    copies = wave1.select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny pad")).alias("text"),
    )
    fresh = docs.filter("doc_id >= 15 and doc_id < 25").select("doc_id", "text")
    copies.unionByName(fresh).write.mode("append").parquet(landing)

    # kill the micro-batch at the chosen index-append point
    def exploding_write(df, path, mode="overwrite", partition_by=()):
        if path.endswith(f"_neardup_index/{crash_on}"):
            raise RuntimeError(f"injected kill before {crash_on} append")
        write_mirror(df, path, mode=mode, partition_by=partition_by)

    monkeypatch.setattr(ingest_mod, "write_mirror", exploding_write)
    with pytest.raises(Exception, match="injected kill"):
        stream_ingest_documents(spark, landing, mirror, ckpt, near_dup_jaccard=0.5)
    monkeypatch.undo()

    # the torn intermediate state the protocol promises
    fresh_chunks, _ = ingest_documents(fresh, chunk_size=256, overlap=32, min_chunk=64)
    fresh_ids = {r["doc_id"] for r in fresh_chunks.select("doc_id").distinct().collect()}
    assert fresh_ids <= _mirror_ids(spark, mirror)  # chunks landed pre-kill
    sh_ids = {r["doc_id"] for r in spark.read.parquet(index + "/shingles").select("doc_id").distinct().collect()}
    band_ids = {r["doc_id"] for r in spark.read.parquet(index + "/bands").select("doc_id").distinct().collect()}
    if crash_on == "shingles":
        assert sh_ids & fresh_ids == set()  # index untouched
    else:
        assert fresh_ids <= sh_ids  # shingles landed...
    assert band_ids & fresh_ids == set()  # ...bands never did

    # restart with the SAME checkpoint: the uncommitted batch replays
    stream_ingest_documents(spark, landing, mirror, ckpt, near_dup_jaccard=0.5)

    # heal: no chunk lost, none double-inserted, copies still rejected
    keys2 = _chunk_keys(spark, mirror)
    assert len(set(keys2)) == len(keys2), "replay double-inserted chunks"
    expected_keys = set(keys1) | {
        r["chunk_key"] for r in fresh_chunks.select("chunk_key").collect()
    }
    assert set(keys2) == expected_keys
    copy_ids = {r["doc_id"] for r in copies.select("doc_id").collect()}
    assert _mirror_ids(spark, mirror) & copy_ids == set()

    # index healed per table: every accepted doc in both tables exactly once
    bands = spark.read.parquet(index + "/bands")
    per_doc = bands.groupBy("doc_id").count().collect()
    assert fresh_ids <= {r["doc_id"] for r in per_doc}
    assert all(r["count"] == 4 for r in per_doc), "bands double-inserted"
    sh = spark.read.parquet(index + "/shingles")
    assert (
        sh.groupBy("doc_id", "shingle").count().filter("count > 1").count() == 0
    ), "shingles double-inserted"

    # the healed index still judges: near-dups of wave-2 docs are dropped
    wave3 = fresh.select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" pad2")).alias("text"),
    )
    wave3.write.mode("append").parquet(landing)
    stream_ingest_documents(spark, landing, mirror, ckpt, near_dup_jaccard=0.5)
    wave3_ids = {r["doc_id"] for r in wave3.select("doc_id").collect()}
    assert _mirror_ids(spark, mirror) & wave3_ids == set()
    assert sorted(_chunk_keys(spark, mirror)) == sorted(keys2)
