"""Python Data Source API (Spark 4): the REST docket scan as a REAL
registered source — `spark.read.format("fake_courtlistener")` — instead
of a helper function (O1 as first-class source plumbing).

Each cursor range becomes one InputPartition, so Spark schedules one
task per range: the partitioned-keyspace parallelism SURVEY §2.1
prescribes falls out of the source contract itself, and downstream
projection/limit behave like any other scan.

The fetcher is the deterministic in-process fake (no network in this
container); a production source swaps `fake_courtlistener_fetcher` for
an HTTP fetcher with the same retry envelope (sources/rest.py).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from lawlm_spark.sources.rest import fake_courtlistener_fetcher, fetch_with_retry

SCHEMA = (
    "docket_id bigint, court_id string, clusters array<string>, "
    "page_cursor string, page_index bigint"
)


class _RangePartition(InputPartition):
    def __init__(self, start: str, end: str | None):
        self.start = start
        self.end = end


class FakeCourtListenerReader(DataSourceReader):
    def __init__(self, options: dict):
        ranges = json.loads(options.get("ranges", '[["page:0", null]]'))
        self.ranges = [(s, e) for s, e in ranges]
        self.max_pages = int(options.get("max_pages_per_range", "10"))

    def partitions(self):
        return [_RangePartition(s, e) for s, e in self.ranges]

    def read(self, partition: _RangePartition):
        cursor, pages = partition.start, 0
        while cursor is not None and cursor != partition.end and pages < self.max_pages:
            page = fetch_with_retry(
                cursor, fake_courtlistener_fetcher, request_delay=0.0, sleep=lambda s: None
            )
            if page is None:
                break
            for d in page.get("results", []):
                yield (
                    int(d["id"]),
                    d.get("court_id"),
                    list(d.get("clusters", [])),
                    cursor,
                    pages,
                )
            cursor = page.get("next")
            pages += 1


class FakeCourtListenerStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: INCREMENTAL REST polling.

    The offset is {cursor, page_index}; each micro-batch reads
    `pages_per_batch` pages from the committed cursor and advances it —
    the API's own pagination cursor IS the streaming offset, which is
    exactly how a production poller checkpoints.  `readBetweenOffsets`
    replays a committed span deterministically (the fake fetcher is a
    pure function of the cursor), so failure recovery re-reads the same
    rows instead of double-polling.  An exhausted feed (cursor None)
    returns the same offset, which ends an availableNow run."""

    def __init__(self, options: dict):
        self.start_cursor = options.get("start_cursor", "page:0")
        self.pages_per_batch = int(options.get("pages_per_batch", "1"))

    def initialOffset(self) -> dict:
        return {"cursor": self.start_cursor, "page_index": 0}

    def _read_pages(self, cursor, page_index: int, n_pages: int):
        rows = []
        while cursor is not None and n_pages > 0:
            page = fetch_with_retry(
                cursor, fake_courtlistener_fetcher, request_delay=0.0, sleep=lambda s: None
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
                        page_index,
                    )
                )
            cursor = page.get("next")
            page_index += 1
            n_pages -= 1
        return rows, cursor, page_index

    def read(self, start: dict):
        if start["cursor"] is None:
            return iter([]), start
        rows, nxt, pi = self._read_pages(
            start["cursor"], start["page_index"], self.pages_per_batch
        )
        return iter(rows), {"cursor": nxt, "page_index": pi}

    def readBetweenOffsets(self, start: dict, end: dict):
        n = int(end["page_index"]) - int(start["page_index"])
        rows, _, _ = self._read_pages(start["cursor"], start["page_index"], n)
        return iter(rows)


class FakeCourtListenerDataSource(DataSource):
    """spark.read.format('fake_courtlistener').option('ranges', ...).load()
    or spark.readStream.format('fake_courtlistener') for the cursor-offset
    polling stream."""

    @classmethod
    def name(cls) -> str:
        return "fake_courtlistener"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return FakeCourtListenerReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return FakeCourtListenerStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FakeCourtListenerDataSource)
