"""JSONL/CSV ingestion with corrupt-record quarantine (sources/textformats.py)."""

from __future__ import annotations

import os

from lawlm_spark.sources.textformats import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)


def test_jsonl_roundtrip_preserves_rows(spark, docs, tmp_path):
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back, bad = split_corrupt(
        read_jsonl(spark, path, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    )
    assert bad.count() == 0
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in back.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert a == b


def test_jsonl_malformed_lines_are_quarantined_not_fatal(spark, tmp_path):
    path = str(tmp_path / "mixed")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write("this is not json at all\n")
        f.write('{"doc_id": 2, "text": "also ok"}\n')
        f.write('{"doc_id": 3, "text": "truncated...\n')
    df = read_jsonl(spark, path, "doc_id bigint, text string")
    clean, bad = split_corrupt(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    quarantined = [r[CORRUPT_COL] for r in bad.collect()]
    assert len(quarantined) == 2
    assert any("not json" in q for q in quarantined)


def test_csv_bad_row_quarantined(spark, tmp_path):
    path = str(tmp_path / "csv")
    os.makedirs(path)
    with open(os.path.join(path, "a.csv"), "w") as f:
        f.write("doc_id,n\n1,10\nnot_a_number,oops\n2,20\n")
    clean, bad = split_corrupt(read_csv(spark, path, "doc_id bigint, n bigint"))
    assert {(r["doc_id"], r["n"]) for r in clean.collect()} == {(1, 10), (2, 20)}
    assert bad.count() == 1


def test_orc_roundtrip(spark, docs, tmp_path):
    from lawlm_spark.sources.textformats import read_orc, write_orc

    path = str(tmp_path / "orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in back.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert a == b


def test_xml_roundtrip_escapes_markup(spark, tmp_path):
    from lawlm_spark.sources.textformats import read_xml, split_corrupt, write_xml

    rows = [
        (1, "plain"),
        (2, "a < b & c > d"),
        (3, '<div class="x">markup inside text</div>'),
        (4, "unicode: 中文 émoji ✓"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "xml")
    write_xml(df, path)
    back, bad = split_corrupt(read_xml(spark, path, "doc_id long, text string"))
    assert bad.count() == 0
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)  # escaping round-trips markup-in-text exactly
