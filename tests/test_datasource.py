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


def test_streaming_source_matches_batch_and_restarts_idempotent(spark, tmp_path):
    """The cursor-offset streaming reader drains the same rows as the
    batch scan (one page per run, RESUMING from the committed cursor on
    every restart), and a run against the exhausted feed reads NOTHING
    new — re-polling cannot duplicate rows."""
    from lawlm_spark.sources.datasource import register

    register(spark)
    batch_rows = spark.read.format("fake_courtlistener").load().count()
    assert batch_rows > 0

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        # parquet sink: the memory sink cannot recover a checkpoint, and
        # checkpoint recovery IS what this test certifies
        q = (
            spark.readStream.format("fake_courtlistener")
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    # a SimpleDataSourceStreamReader availableNow run advances one
    # read() per run; each run RESUMES from the committed cursor, so
    # draining across restarts proves the offset is the restart point
    seen, prev = drain(), -1
    runs = 1
    while seen != prev and runs < 32:
        prev, seen = seen, drain()
        runs += 1
    assert seen == batch_rows
    assert drain() == batch_rows  # exhausted feed: zero new rows
    # and the streamed payload is row-identical to the batch scan
    got = {r["docket_id"] for r in spark.read.parquet(out).collect()}
    want = {r["docket_id"] for r in spark.read.format("fake_courtlistener").load().collect()}
    assert got == want
