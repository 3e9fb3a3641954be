"""Python Data Source API: the registered REST source scans by cursor
range, one task per range."""

from __future__ import annotations

import json

from lawlm_spark.sources import datasource


def test_registered_source_reads(spark):
    datasource.register(spark)
    df = spark.read.format("fake_courtlistener").load()
    rows = df.collect()
    assert sorted(r["docket_id"] for r in rows) == list(range(12))
    assert df.columns == ["docket_id", "court_id", "clusters", "page_cursor", "page_index"]


def test_ranges_become_partitions(spark):
    datasource.register(spark)
    df = (
        spark.read.format("fake_courtlistener")
        .option("ranges", json.dumps([["page:0", "page:2"], ["page:2", None]]))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one task per cursor range
    assert sorted(r["docket_id"] for r in df.collect()) == list(range(12))


def test_source_composes_with_engine(spark):
    """The registered source feeds the same downstream E1 ops."""
    from lawlm_spark.operators.relational import anti_join_new
    from lawlm_spark.sources.rest import expand_nested, fake_courtlistener_fetcher

    datasource.register(spark)
    dockets = spark.read.format("fake_courtlistener").load()
    existing = spark.createDataFrame([(0,)], ["docket_id"])
    fresh = anti_join_new(dockets, existing, "docket_id")
    ops = expand_nested(fresh, fake_courtlistener_fetcher)
    assert ops.count() == 22  # (12-1 dockets) x 2 sub-opinions
