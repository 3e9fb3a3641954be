"""The reference's incremental-ingest loop end to end THROUGH the
mirror: state scan (O6/O21) -> anti-join (O22) -> upsert/append (O7) ->
audit (O24).  Running ingest twice must not grow the index."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from lawlm_spark.operators.relational import anti_join_new, distinct_keys, dup_audit
from lawlm_spark.plans.rag import ingest_documents
from lawlm_spark.sources.mirror import mirror_exists, scan_mirror, write_mirror


def _ingest_increment(spark, docs, path):
    """One incremental run: chunk the docs, skip chunks already in the
    mirror, append the rest.  Returns rows appended."""
    chunks, _ = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    chunks = chunks.drop("embedding")
    if mirror_exists(path):
        existing = distinct_keys(scan_mirror(spark, path), "point_id")
        fresh = anti_join_new(chunks, existing, "point_id")
    else:
        fresh = chunks
    n = fresh.count()
    if n:
        write_mirror(fresh, path, mode="append")
    return n


def test_incremental_ingest_through_mirror(spark, docs):
    path = tempfile.mkdtemp(prefix="incr_mirror_") + "/index"
    first_half = docs.filter("doc_id % 2 = 0")

    n1 = _ingest_increment(spark, first_half, path)
    assert n1 > 0
    # re-running the same input appends NOTHING (idempotent)
    assert _ingest_increment(spark, first_half, path) == 0
    assert scan_mirror(spark, path).count() == n1

    # new docs append only their own chunks
    n2 = _ingest_increment(spark, docs, path)
    total = scan_mirror(spark, path)
    assert total.count() == n1 + n2
    # invariant after all runs: no duplicate point ids in the index
    assert dup_audit(total, ["point_id"]).count() == 0
