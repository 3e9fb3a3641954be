"""Python UDTF surface (SURVEY §2.6 gap ledger: the reference has no
UDTF; a complete engine serves one).

`SentenceSplitter` is a Spark 4 Python UDTF: one text row in, one row
per sentence out, with index and char offsets — the table-function
shape used for span extraction, citation windows, or per-sentence
embedding.  Registered it runs in SQL as
`SELECT ..., s.* FROM docs, LATERAL split_sentences(text) s`.

Segmentation rule: the text tiles into matches of `[^.!?]+[.!?]*`
(run of non-terminators plus its trailing terminators); each match is
trimmed and empty pieces are skipped.  Chosen to be RE2-compatible (no
lookbehind) so the identical rule runs in DuckDB — the v20 oracle
certifies the UDTF *execution path* end to end, offsets included.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_PIECE = re.compile(r"[^.!?]+[.!?]*")


@udtf(returnType="sentence_index int, start_char int, sentence string")
class SentenceSplitter:
    """One output row per sentence: (sentence_index, start_char, sentence).

    start_char is the 0-based offset of the first non-space character of
    the sentence in the original text; sentence_index counts emitted
    sentences from 0.
    """

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if not text:
            return
        emitted = 0
        for m in _PIECE.finditer(text):
            piece = m.group()
            sentence = piece.strip()
            if not sentence:
                continue
            lead = len(piece) - len(piece.lstrip())
            yield emitted, m.start() + lead, sentence
            emitted += 1


def register_udtfs(spark) -> None:
    """Make the UDTF callable from SQL as split_sentences(...)."""
    spark.udtf.register("split_sentences", SentenceSplitter)
