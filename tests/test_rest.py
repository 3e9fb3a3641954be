"""REST ingestion tier O1/O2/O3 (fake fetcher — no network)."""

from __future__ import annotations

from lawlm_spark.operators.relational import anti_join_new
from lawlm_spark.plans.ingest_api import ingest_from_api
from lawlm_spark.sources.rest import (
    expand_nested,
    fake_courtlistener_fetcher,
    fetch_with_retry,
    paginated_scan,
)


def test_fetch_with_retry_backoff():
    calls, sleeps = [], []
    def flaky(url):
        calls.append(url)
        return {"ok": 1} if len(calls) == 3 else None
    out = fetch_with_retry("u", flaky, max_retries=3, retry_delay=2.0, request_delay=0.5,
                           sleep=sleeps.append)
    assert out == {"ok": 1} and len(calls) == 3
    # reference pacing: request_delay before each call, linear backoff after failures
    assert sleeps == [0.5, 2.0, 0.5, 4.0, 0.5]


def test_fetch_with_retry_exhausts_to_none():
    assert fetch_with_retry("u", lambda u: None, max_retries=2, sleep=lambda s: None) is None


def test_paginated_scan_follows_cursors(spark):
    dockets = paginated_scan(spark, [("page:0", None)], fake_courtlistener_fetcher)
    rows = dockets.collect()
    assert len(rows) == 12  # 4 pages x 3 dockets
    assert sorted(r["docket_id"] for r in rows) == list(range(12))
    assert all(r["court_id"] == "scotus" and len(r["clusters"]) == 1 for r in rows)


def test_paginated_scan_partitioned_ranges(spark):
    # two disjoint cursor ranges scan in parallel and union cleanly
    dockets = paginated_scan(
        spark, [("page:0", "page:2"), ("page:2", None)], fake_courtlistener_fetcher
    )
    assert sorted(r["docket_id"] for r in dockets.collect()) == list(range(12))


def test_expand_nested_flattens(spark):
    dockets = paginated_scan(spark, [("page:0", "page:1")], fake_courtlistener_fetcher)
    ops = expand_nested(dockets, fake_courtlistener_fetcher)
    rows = ops.collect()
    assert len(rows) == 6  # 3 dockets x 1 cluster x 2 sub-opinions
    assert all(r["judges"] == "Marshall" for r in rows)
    assert all('"html_with_citations"' in r["raw_json"] for r in rows)


def test_ingest_from_api_end_to_end(spark):
    existing = spark.createDataFrame([(0,), (1,)], ["docket_id"])
    opinions, chunks = ingest_from_api(
        spark, [("page:0", None)], fake_courtlistener_fetcher, existing
    )
    ops = opinions.collect()
    assert len(ops) == 20  # (12 - 2 already-ingested) x 2 opinions
    assert all(r["source_field"] == "html_with_citations" for r in ops)  # O4 provenance
    assert all("347 U.S. 483" in r["citations"] for r in ops)  # O12 on cleaned text
    assert all("<p>" not in r["opinion_text"] for r in ops)  # O11 stripped
    ch = chunks.collect()
    assert ch and len({r["chunk_key"] for r in ch}) == len(ch)  # O18 unique keys
    assert all(len(r["point_id"]) == 36 for r in ch)  # uuid5 ids


def test_ingest_full_opinions_schema_and_denormalized_payload(spark):
    """SURVEY §1.3 contract: all 21 opinion columns, incl. the B3
    case_name fix, and the full metadata denormalized into every chunk
    (reference chunk.py:15-23)."""
    opinions, chunks = ingest_from_api(spark, [("page:0", "page:1")], fake_courtlistener_fetcher)
    expected = [
        "docket_id", "cluster_id", "opinion_id", "court", "date_filed",
        "case_name", "judges", "precedential_status", "author", "opinion_type",
        "sha1", "download_url", "date_created", "date_modified", "source_field",
        "raw_text", "opinion_text", "citations", "legal_entities", "text_stats",
        "page_cursor", "page_index",
    ]
    assert opinions.columns == expected
    ops = opinions.collect()
    assert all(r["case_name"] and "v. State" in r["case_name"] for r in ops)  # B3 fixed
    assert all(r["court"] == "scotus" for r in ops)
    assert all(r["opinion_type"] in ("majority", "dissent") for r in ops)
    assert all(r["date_filed"].isoformat() == "2020-01-15" for r in ops)
    assert all(r["date_created"] is not None and r["sha1"] for r in ops)
    # chunk payload carries the opinion metadata (app.py:345-358 projects it)
    ch = chunks.collect()
    for field in ("case_name", "court", "opinion_type", "download_url",
                  "judges", "sha1", "page_cursor"):
        assert all(r[field] is not None for r in ch), field
    assert all(r["page_cursor"] == "page:0" for r in ch)


def test_resume_cursor_end_to_end(spark):
    """B1 fixed end to end: the mirror's chunks yield the last-ingested
    page cursor, so a follow-up run starts where the previous stopped
    instead of re-walking from page 1 (the reference always restarted)."""
    from lawlm_spark.plans.ingest_api import resume_cursor

    _, chunks = ingest_from_api(spark, [("page:0", "page:3")], fake_courtlistener_fetcher)
    cur = resume_cursor(chunks)
    assert cur == "page:2"  # pages 0,1,2 walked; last page_cursor wins
    # resuming from there ingests only the remaining page's dockets
    _, more = ingest_from_api(spark, [(cur, None)], fake_courtlistener_fetcher)
    docket_ids = {r["docket_id"] for r in more.select("docket_id").collect()}
    assert docket_ids == {6, 7, 8, 9, 10, 11}  # pages 2-3 (resume re-reads its own page)
    assert resume_cursor(more) == "page:3"


def test_resume_cursor_past_page_ten(spark):
    """Regression (ADVICE r3): within one run every chunk shares one
    current_timestamp(), so the struct-max tie-break decides the resume
    point.  Ordering by the cursor STRING picks 'page:9' over 'page:11'
    (lexicographic), pinning resume to a fixed point forever; the
    page_index ordinal must win instead."""
    from lawlm_spark.plans.ingest_api import resume_cursor
    from lawlm_spark.sources.rest import make_fake_fetcher

    fetcher = make_fake_fetcher(num_pages=12)
    _, chunks = ingest_from_api(
        spark, [("page:0", None)], fetcher, max_pages_per_range=12
    )
    assert resume_cursor(chunks) == "page:11"  # not 'page:9'


def test_resume_cursor_pre_page_index_mirror(spark):
    """Migration path (ADVICE r4): mirrors written before page_index
    existed must stay resumable — resume_cursor falls back to the
    (time_ingested, cursor) struct instead of raising AnalysisException."""
    from lawlm_spark.plans.ingest_api import resume_cursor

    _, chunks = ingest_from_api(spark, [("page:0", "page:3")], fake_courtlistener_fetcher)
    old_mirror = chunks.drop("page_index")  # what a pre-r4 mirror looks like
    assert resume_cursor(old_mirror) == "page:2"
