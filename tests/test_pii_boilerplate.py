"""PII scrubbing (functions/text.py) and corpus-level boilerplate line
removal (operators/boilerplate.py).  Cross-engine parity is d22/d23's
oracle job; semantics are pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.functions.text import pii_counts, scrub_pii
from lawlm_spark.operators.boilerplate import (
    boilerplate_lines,
    remove_boilerplate_lines,
)


def test_scrub_pii_all_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "write to jane.doe+x@firm-llp.co.uk or call 555-123-4567"),
            (2, "ssn on file: 123-45-6789; fallback 555.867.5309 x"),
            (3, "no pii here at all"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in df.select("id", scrub_pii(F.col("text")).alias("s"),
                                         pii_counts(F.col("text")).alias("c")).collect()}
    assert out[1]["s"] == "write to [EMAIL] or call [PHONE]"
    assert out[1]["c"]["n_email"] == 1 and out[1]["c"]["n_phone"] == 1 and out[1]["c"]["n_ssn"] == 0
    assert out[2]["s"] == "ssn on file: [SSN]; fallback [PHONE] x"
    assert out[2]["c"]["n_ssn"] == 1 and out[2]["c"]["n_phone"] == 1
    assert out[3]["s"] == "no pii here at all"
    assert out[3]["c"]["n_email"] == out[3]["c"]["n_ssn"] == out[3]["c"]["n_phone"] == 0


def _corpus(spark):
    rows = [
        (i, f"unique opening line {i}\nSTANDARD FOOTER NOTICE\nbody text {i} varies")
        for i in range(10)
    ] + [(99, "totally original document\n\nwith a blank line")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_lines_detected(spark):
    b = {r["norm"]: r["nd"] for r in
         boilerplate_lines(_corpus(spark), "doc_id", "text", max_doc_frac=0.5).collect()}
    assert b == {"STANDARD FOOTER NOTICE": 10}  # 10/11 docs > 50%; blanks never count


def test_remove_boilerplate_preserves_order_and_docs(spark):
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate_lines(_corpus(spark), "doc_id", "text", max_doc_frac=0.5).collect()}
    assert len(out) == 11  # one row per input doc
    assert out[3] == "unique opening line 3\nbody text 3 varies"  # footer gone, order kept
    assert out[99] == "totally original document\n\nwith a blank line"  # untouched


def test_remove_boilerplate_all_lines_doc(spark):
    df = spark.createDataFrame(
        [(i, "the only line") for i in range(5)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["text"] for r in
           remove_boilerplate_lines(df, "doc_id", "text", max_doc_frac=0.5).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(t == "" for t in out.values())  # fully-boilerplate docs survive, empty
