"""Golden pins for the procedural chunkers (SURVEY §5.2): exact outputs
on fixed inputs, so any semantic drift in the recursive splitter or the
sentence-boundary repair fails loudly."""

from __future__ import annotations

from lawlm_spark.operators.chunking import (
    chunk_document,
    fix_chunk_end,
    fix_chunk_start,
    recursive_split,
)

PARA = (
    "The court finds the argument unpersuasive. The statute is clear on its face. "
    "Petitioner raises three claims for relief in this matter before the court."
)
DOC = (PARA + "\n\n") * 6


def test_recursive_split_golden():
    # each paragraph+separator is 155 chars; two don't fit in 256 -> one
    # chunk per paragraph, six total, exact partition of the input
    chunks = recursive_split(DOC, chunk_size=256, overlap=0)
    assert len(chunks) == 6
    assert chunks[0] == PARA + "\n\n"
    assert all(len(c) <= 256 for c in chunks)
    assert "".join(chunks) == DOC  # zero overlap -> exact partition


def test_recursive_split_overlap_golden():
    chunks = recursive_split(DOC, chunk_size=256, overlap=64)
    assert all(len(c) <= 256 for c in chunks)
    # each successor begins with its predecessor's tail when carry fits
    for prev, nxt in zip(chunks, chunks[1:]):
        assert nxt.startswith(prev[-64:]) or len(prev[-64:]) + 1 > 256 - len(nxt)


def test_fix_chunk_start_golden():
    assert (
        fix_chunk_start("ment was denied. The appeal followed promptly")
        == "The appeal followed promptly"
    )
    assert fix_chunk_start("frag without boundary\n\nNew paragraph text") == "New paragraph text"
    assert fix_chunk_start("Clean start already") == "Clean start already"


def test_fix_chunk_end_golden():
    assert (
        fix_chunk_end("The motion is granted. The clerk shall ente")
        == "The motion is granted."
    )
    tail = "x" * 90 + "; short tail"
    assert fix_chunk_end(tail) == tail[: tail.rfind(";") + 1]


def test_chunk_document_golden():
    # 918-char doc fits one default-size (1536) chunk; repair trims the
    # trailing separator back to terminal punctuation
    out = chunk_document(DOC)
    assert len(out) == 1
    assert len(out[0]) == 916
    assert out[0].startswith("The court finds") and out[0].endswith("before the court.")

    # a doc larger than chunk_size yields multiple repaired chunks
    big = chunk_document((PARA + "\n\n") * 30)
    assert len(big) > 1
    assert all(len(c) >= 400 for c in big)  # min_chunk_size gate
    assert all(c[0].isupper() for c in big)  # starts repaired
    assert all(c.endswith(".") for c in big)  # ends repaired
