"""Partitioned REST ingestion tier (O1/O2/O3, SURVEY.md §2.1).

The reference walks CourtListener sequentially on the driver: one
cursor-paginated docket loop, then per docket a cluster fetch and per
cluster a sub-opinion fetch, all single-threaded with sleep-based rate
limiting (reference: data-ingestion/data_extraction.py:67-222,
opinion_utills.py:14-40).  The Spark-native shape:

  O1  paginated_scan  — the id-ordered keyspace is pre-partitioned into
      cursor RANGES on the driver (cheap metadata), one range per task;
      each task walks its range's pages inside mapInPandas.  1000
      executors fetch 1000 ranges concurrently; per-task rate limiting
      keeps the aggregate under the API budget.
  O2  expand_nested   — docket -> explode(cluster urls) -> fetch UDF ->
      explode(sub_opinions) -> fetch UDF, with skip-and-log error
      tolerance (failed fetch -> null row -> filter).
  O3  fetch_with_retry — linear-backoff retry around a single GET,
      retained verbatim inside the fetch UDFs.

Network access is injected: every operator takes a `fetcher(url) ->
dict | None` callable.  The default `http_fetcher` is gated behind an
import-try (requests is not guaranteed in this container); tests use
`fake_courtlistener_fetcher`, a deterministic in-process stand-in that
mimics the reference's /dockets pagination + cluster/opinion payloads.

Plan-hygiene: the anti-join against already-ingested docket ids
(operators/relational.anti_join_new) must run BETWEEN O1 and O2 —
Catalyst cannot reorder filters across opaque python UDFs, so the
pipeline builder places the cheap dedup before the expensive fetches
(SURVEY.md §4).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

Fetcher = Callable[[str], "dict | None"]

DOCKET_SCHEMA = StructType(
    [
        StructField("docket_id", LongType()),
        StructField("court_id", StringType()),
        StructField("clusters", ArrayType(StringType())),
        StructField("page_cursor", StringType()),
        # Monotonic per-range page ordinal.  Cursors are OPAQUE strings
        # (real CourtListener cursors are tokens); any resume logic that
        # orders by the cursor string itself is wrong ('page:9' > 'page:10'
        # lexicographically), so the walk records how far it got.
        StructField("page_index", LongType()),
    ]
)

OPINION_FETCH_SCHEMA = StructType(
    [
        StructField("docket_id", LongType()),
        StructField("cluster_id", LongType()),
        StructField("opinion_id", LongType()),
        StructField("court", StringType()),        # docket.court_id (data_extraction.py:165)
        StructField("case_name", StringType()),    # cluster JSON — the B3 fix (SURVEY §1.4)
        StructField("date_filed", StringType()),
        StructField("judges", StringType()),
        StructField("precedential_status", StringType()),
        StructField("page_cursor", StringType()),
        StructField("page_index", LongType()),
        StructField("raw_json", StringType()),
    ]
)


def fetch_with_retry(
    url: str,
    fetcher: Fetcher,
    max_retries: int = 3,
    retry_delay: float = 2.0,
    request_delay: float = 0.5,
    sleep: Callable[[float], None] = time.sleep,
) -> dict | None:
    """O3: linear-backoff retry (reference opinion_utills.py:14-40:
    delay request_delay before each call, retry_delay*(attempt+1) after a
    failure).  Returns None when retries are exhausted (skip-and-log)."""
    for attempt in range(max_retries):
        sleep(request_delay)
        try:
            out = fetcher(url)
            if out is not None:
                return out
        except Exception:  # noqa: BLE001 - skip-and-log semantics
            pass
        if attempt < max_retries - 1:
            sleep(retry_delay * (attempt + 1))
    return None


def http_fetcher(url: str) -> dict | None:  # pragma: no cover - needs network
    """Default fetcher: GET url, parse JSON.  Gated on requests."""
    try:
        import requests  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "requests not installed; inject a fetcher (tests use "
            "fake_courtlistener_fetcher)"
        ) from e
    resp = requests.get(url, timeout=30)
    resp.raise_for_status()
    return resp.json()


def paginated_scan(
    spark: SparkSession,
    cursor_ranges: list[tuple[str, str | None]],
    fetcher: Fetcher,
    max_pages_per_range: int = 10,
    request_delay: float = 0.0,
) -> DataFrame:
    """O1: partitioned cursor-paginated scan -> bronze dockets DataFrame.

    cursor_ranges: [(start_cursor, end_cursor_exclusive_or_None), ...] —
    one Spark task per range; each task follows `next` links until its
    end cursor or page budget.  At scale ranges come from a keyspace
    split (id-ordered API), giving linear scan parallelism the reference
    fundamentally lacks.
    """
    ranges = spark.createDataFrame(
        [(s, e) for s, e in cursor_ranges], "start_cursor string, end_cursor string"
    ).repartition(max(len(cursor_ranges), 1))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for start, end in pdf.itertuples(index=False):
                cursor, pages = start, 0
                while cursor is not None and cursor != end and pages < max_pages_per_range:
                    page = fetch_with_retry(
                        cursor, fetcher, request_delay=request_delay, sleep=lambda s: None
                    )
                    if page is None:
                        break
                    for d in page.get("results", []):
                        rows.append(
                            (
                                int(d["id"]),
                                d.get("court_id"),
                                list(d.get("clusters", [])),
                                cursor,
                                pages,
                            )
                        )
                    cursor = page.get("next")
                    pages += 1
            yield pd.DataFrame(rows, columns=[f.name for f in DOCKET_SCHEMA.fields])

    return ranges.mapInPandas(run, schema=DOCKET_SCHEMA)


def expand_nested(
    dockets: DataFrame, fetcher: Fetcher, request_delay: float = 0.0
) -> DataFrame:
    """O2: docket -> clusters -> sub-opinions flatten with per-item error
    tolerance (reference data_extraction.py:133-222).

    explode(clusters) keeps the fetch fan-out distributed (one task per
    partition of cluster URLs); failed fetches yield no row (the
    reference's skip-and-log).
    """
    urls = dockets.select(
        "docket_id",
        "court_id",
        "page_cursor",
        "page_index",
        F.explode("clusters").alias("cluster_url"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for docket_id, court_id, page_cursor, page_index, cluster_url in pdf.itertuples(
                index=False
            ):
                cluster = fetch_with_retry(
                    cluster_url, fetcher, request_delay=request_delay, sleep=lambda s: None
                )
                if cluster is None:
                    continue  # skip-and-log
                for op_url in cluster.get("sub_opinions", []):
                    op = fetch_with_retry(
                        op_url, fetcher, request_delay=request_delay, sleep=lambda s: None
                    )
                    if op is None:
                        continue
                    rows.append(
                        (
                            int(docket_id),
                            int(cluster["id"]),
                            int(op["id"]),
                            court_id,
                            cluster.get("case_name"),
                            cluster.get("date_filed"),
                            cluster.get("judges"),
                            cluster.get("precedential_status"),
                            page_cursor,
                            int(page_index),
                            json.dumps(op, sort_keys=True),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in OPINION_FETCH_SCHEMA.fields])

    return urls.mapInPandas(run, schema=OPINION_FETCH_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic fake CourtListener (test double; no network)


def make_fake_fetcher(num_pages: int = 4) -> Fetcher:
    """Build a fake CourtListener fetcher whose /dockets keyspace has
    `num_pages` pages.  num_pages > 10 exercises the lexicographic cursor
    trap ('page:9' > 'page:10' as strings) that resume_cursor must not
    fall into."""

    def fetch(url: str) -> dict | None:
        return _fake_fetch(url, num_pages)

    return fetch


def fake_courtlistener_fetcher(url: str) -> dict | None:
    """In-process stand-in mimicking the reference's API shapes:
    /dockets pages of 3 with `next` cursors, clusters with 2 sub-opinions,
    opinions with the 6 coalesce-able text fields (config.yml:26-34)."""
    return _fake_fetch(url, num_pages=4)


def _fake_fetch(url: str, num_pages: int) -> dict | None:
    if url.startswith("page:"):
        page_no = int(url.split(":", 1)[1])
        if page_no >= num_pages:
            return {"results": [], "next": None}
        base = page_no * 3
        return {
            "results": [
                {
                    "id": base + i,
                    "court_id": "scotus",
                    "clusters": [f"cluster:{base + i}"],
                }
                for i in range(3)
            ],
            "next": f"page:{page_no + 1}" if page_no < num_pages - 1 else None,
        }
    if url.startswith("cluster:"):
        cid = int(url.split(":", 1)[1])
        return {
            "id": cid * 10,
            "case_name": f"Case {cid} v. State",
            "date_filed": "2020-01-15",
            "judges": "Marshall",
            "precedential_status": "Published",
            "sub_opinions": [f"opinion:{cid * 10}_{j}" for j in range(2)],
        }
    if url.startswith("opinion:"):
        oid = url.split(":", 1)[1]
        num = int(oid.replace("_", ""))
        return {
            "id": num,
            "author_id": 100 + num % 7,
            "type": "majority" if num % 2 == 0 else "dissent",
            "sha1": f"{num:040x}",
            "download_url": f"https://example.org/op/{num}.pdf",
            "date_created": "2020-02-01T10:00:00Z",
            "date_modified": "2020-03-01T11:30:00Z",
            "html_with_citations": f"<p>Opinion {oid} citing 347 U.S. 483 (1954). "
            + "The court held accordingly in this matter. " * 20
            + "</p>",
            "plain_text": f"Opinion {oid} plain text fallback.",
            "html_columbia": None,
            "html_lawbox": None,
            "html_anon_2020": None,
            "html": None,
        }
    if url.startswith("flaky:"):
        return None
    raise ValueError(f"unknown fake url {url!r}")
