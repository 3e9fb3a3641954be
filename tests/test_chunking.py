"""Chunking operators O16/O17: declarative fixed-window + reference-parity
recursive splitter with sentence-boundary repair."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.chunking import (
    chunk_document,
    fix_chunk_end,
    fix_chunk_start,
    fixed_window_chunks,
    recursive_split,
    recursive_split_chunks,
    repair_chunks,
)


def test_fixed_window_shape(spark):
    text = "x" * 1000
    df = spark.createDataFrame([(1, text)], ["id", "t"])
    rows = fixed_window_chunks(df, "id", "t", chunk_size=256, overlap=32, min_chunk=64).collect()
    # step=224: starts 0,224,448,672,896 -> last window 104 chars >= 64
    assert [r["chunk_index"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(len(r["chunk_text"]) <= 256 for r in rows)
    # overlap: consecutive windows share 32 chars of position space
    assert rows[0]["chunk_text"][-32:] == rows[1]["chunk_text"][:32]


def test_fixed_window_drops_short(spark):
    df = spark.createDataFrame([(1, "short text under fifty")], ["id", "t"])
    assert fixed_window_chunks(df, "id", "t").count() == 0


def test_recursive_split_bounds():
    text = ("Sentence one is here. " * 40 + "\n\n") * 3
    chunks = recursive_split(text, chunk_size=256, overlap=32)
    assert chunks
    assert all(len(c) <= 256 for c in chunks)
    assert "".join(c[: len(c)] for c in chunks)  # non-empty pieces


def test_fix_chunk_start():
    assert fix_chunk_start("tail of prior. New sentence here") == ". New sentence here"[2:]
    assert fix_chunk_start("Already capital start") == "Already capital start"


def test_fix_chunk_end():
    assert fix_chunk_end("One sentence. Trailing frag").endswith(".")
    assert fix_chunk_end("no terminal punctuation at all") == "no terminal punctuation at all"


def test_repair_drops_fragments():
    out = repair_chunks(["tiny.", "X" * 300 + ". " + "y" * 80], min_chunk=100)
    assert all(len(c) >= 100 for c in out)


def test_chunk_document_empty():
    assert chunk_document("") == []
    assert chunk_document("too short") == []


def test_recursive_split_chunks_schema(spark, docs):
    out = recursive_split_chunks(
        docs.limit(20).select("doc_id", F.col("text")), "doc_id", "text"
    )
    assert out.columns == ["doc_id", "chunk_index", "chunk_text"]
    out.collect()  # runs the pandas UDF without error
