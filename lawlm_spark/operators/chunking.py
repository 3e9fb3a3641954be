"""Chunking operators (O16/O17, SURVEY.md §2.2).

Two chunkers, one schema:

  fixed_window_chunks   — the engine's canonical, fully declarative
                          chunker: overlapping character windows via
                          sequence + substring + posexplode.  Pure
                          Catalyst (codegen, no Python), and expressible
                          verbatim in the DuckDB oracle.
  recursive_split_chunks— reference-parity chunker: a vendored
                          deterministic re-implementation of recursive
                          character splitting (separator hierarchy
                          "\\n\\n", ". ", "? ", "! ", "\\n", " ", "" —
                          reference data_extraction.py:47-52 /
                          config.yml:5-17) followed by the sentence-
                          boundary repair pass (reference
                          opinion_utills.py:182-317 semantics: cut the
                          chunk start forward to a sentence boundary,
                          truncate the end back to terminal punctuation,
                          drop fragments < min_chunk_size).  Runs as an
                          arrow-batched pandas UDF over array<string> —
                          the per-document work is inherently procedural.

Defaults mirror the reference config: chunk_size=1536, overlap=300,
min_chunk_size=400 (config.yml:6-8); pre-chunk texts < 50 chars are
dropped (data_extraction.py:230-240).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

CHUNK_SIZE = 1536
CHUNK_OVERLAP = 300
MIN_CHUNK_SIZE = 400
MIN_TEXT_SIZE = 50

SEPARATORS = ("\n\n", ". ", "? ", "! ", "\n", " ", "")


# ---------------------------------------------------------------------------
# Declarative fixed-window chunker


def fixed_window_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    min_chunk: int = MIN_CHUNK_SIZE,
) -> DataFrame:
    """(id, chunk_index, chunk_text): overlapping character windows.

    step = chunk_size - overlap; window i covers [i*step, i*step+chunk_size).
    Trailing windows shorter than min_chunk are dropped.  posexplode gives
    the chunk index without a window function (no extra shuffle).
    """
    step = chunk_size - overlap
    positions = F.sequence(F.lit(0), F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)), F.lit(step))
    chunks = F.transform(positions, lambda p: F.substring(F.col(text_col), p + 1, chunk_size))
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) >= MIN_TEXT_SIZE)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_index", "chunk_text"))
        .filter(F.length("chunk_text") >= min_chunk)
    )


def fixed_window_chunks_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
    min_chunk: int = MIN_CHUNK_SIZE,
) -> str:
    """DuckDB oracle SQL computing the identical chunk set."""
    step = chunk_size - overlap
    return f"""
        SELECT {id_col},
               CAST(p // {step} AS BIGINT) AS chunk_index,
               substring({text_col}, p + 1, {chunk_size}) AS chunk_text
        FROM (
          SELECT {id_col}, {text_col},
                 unnest(generate_series(0, greatest(length({text_col}) - 1, 0), {step})) AS p
          FROM {table}
          WHERE length(trim({text_col})) >= {MIN_TEXT_SIZE}
        )
        WHERE length(substring({text_col}, p + 1, {chunk_size})) >= {min_chunk}
    """


# ---------------------------------------------------------------------------
# Reference-parity recursive splitter + repair (procedural, pandas UDF)

_SENTENCE_START = re.compile(r"[.!?]\s+[A-Z]")
_PARA_START = re.compile(r"\n\s*\n\s*")


def recursive_split(text: str, chunk_size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP,
                    separators: tuple[str, ...] = SEPARATORS) -> list[str]:
    """Deterministic recursive character splitting.

    Split on the coarsest separator that yields pieces; greedily pack
    pieces into windows <= chunk_size; windows overlap by carrying the
    last `overlap` characters forward.  Pieces longer than chunk_size
    recurse with the next separator.  (Capability parity with the
    reference's RecursiveCharacterTextSplitter use at
    data_extraction.py:225-250; implementation is our own.)
    """
    if len(text) <= chunk_size:
        return [text] if text else []

    sep = separators[-1]
    rest: tuple[str, ...] = ()
    for i, s in enumerate(separators):
        if s == "" or s in text:
            sep, rest = s, separators[i + 1 :]
            break

    if sep == "":
        pieces = [text[i : i + chunk_size] for i in range(0, len(text), chunk_size)]
    else:
        raw = text.split(sep)
        pieces = [p + sep for p in raw[:-1]] + [raw[-1]]

    # recurse oversized pieces with finer separators
    flat: list[str] = []
    for p in pieces:
        if len(p) > chunk_size and rest:
            flat.extend(recursive_split(p, chunk_size, 0, rest))
        else:
            flat.append(p)

    chunks: list[str] = []
    cur = ""
    for p in flat:
        if cur and len(cur) + len(p) > chunk_size:
            chunks.append(cur)
            carry = cur[-overlap:] if overlap else ""
            # drop the overlap carry when it would push past chunk_size —
            # keeps every emitted chunk <= chunk_size (pieces recurse to fit)
            cur = carry if len(carry) + len(p) <= chunk_size else ""
        cur += p
    if cur.strip():
        chunks.append(cur)
    return chunks


def fix_chunk_start(chunk: str) -> str:
    """Cut forward to the first sentence boundary (reference
    opinion_utills.py 'fix_chunk_start' semantics: first `[.!?]\\s+[A-Z]`,
    else paragraph break, else keep if it already starts with a capital)."""
    if not chunk or chunk[0].isupper():
        return chunk
    m = _SENTENCE_START.search(chunk)
    if m:
        return chunk[m.end() - 1 :]
    m = _PARA_START.search(chunk)
    if m:
        return chunk[m.end() :]
    return chunk


def fix_chunk_end(chunk: str) -> str:
    """Truncate back to the last terminal punctuation; fall back to ';'/':'
    if they appear in the final 20% (reference 'fix_chunk_end' semantics)."""
    if not chunk:
        return chunk
    last = max(chunk.rfind("."), chunk.rfind("!"), chunk.rfind("?"))
    if last >= 0:
        return chunk[: last + 1]
    soft = max(chunk.rfind(";"), chunk.rfind(":"))
    if soft >= int(len(chunk) * 0.8):
        return chunk[: soft + 1]
    return chunk


def repair_chunks(chunks: list[str], min_chunk: int = MIN_CHUNK_SIZE) -> list[str]:
    """fix_chunk_overlaps pass: repair starts/ends, drop fragments."""
    out = []
    for c in chunks:
        c = c.strip()
        if len(c) < MIN_TEXT_SIZE:
            continue
        c = fix_chunk_end(fix_chunk_start(c)).strip()
        if len(c) >= min_chunk:
            out.append(c)
    return out


def chunk_document(text: str) -> list[str]:
    if not text or len(text.strip()) < MIN_TEXT_SIZE:
        return []
    return repair_chunks(recursive_split(text))


@F.pandas_udf(ArrayType(StringType()))
def chunk_text_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: chunk_document(t or ""))


def recursive_split_chunks(
    docs: DataFrame, id_col: str, text_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, *carry, chunk_index, chunk_text) via the reference-parity chunker.

    `carry` columns ride through the select untouched — the chunk UDF is a
    scalar pandas UDF, so denormalizing opinion metadata into every chunk
    (reference chunk.py:15-23 to_dict) needs no join and no re-execution
    of the upstream (possibly fetch-UDF) lineage.
    """
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.posexplode(chunk_text_udf(F.col(text_col))).alias("chunk_index", "chunk_text"),
    )
