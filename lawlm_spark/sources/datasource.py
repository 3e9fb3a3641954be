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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


class FakeCourtListenerDataSource(DataSource):
    """spark.read.format('fake_courtlistener').option('ranges', ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "fake_courtlistener"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return FakeCourtListenerReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FakeCourtListenerDataSource)
