"""Python Data Source writer (sources/upsert_sink.py): the two-phase
commit protocol and the latest-generation-wins upsert merge."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lawlm_spark.sources.upsert_sink import (
    committed_generations,
    read_upsert_mirror,
    register,
)

SCHEMA = "point_id string, payload string, score bigint"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_write_commit_and_read_back(spark, tmp_path):
    path = str(tmp_path / "mirror")
    _df(spark, [("a", "one", 1), ("b", "two", 2)]).write.format(
        "upsert_mirror"
    ).option("path", path).mode("append").save()
    assert committed_generations(path) == [0]
    got = {
        r["point_id"]: (r["payload"], r["score"])
        for r in read_upsert_mirror(spark, path, SCHEMA).collect()
    }
    assert got == {"a": ("one", 1), "b": ("two", 2)}
    # temp dir drained by commit
    assert os.listdir(os.path.join(path, "_tmp")) == []


def test_upsert_latest_generation_wins(spark, tmp_path):
    path = str(tmp_path / "mirror")
    w = lambda rows: _df(spark, rows).write.format("upsert_mirror").option(
        "path", path
    ).mode("append").save()
    w([("a", "one", 1), ("b", "two", 2)])
    w([("b", "two-v2", 22), ("c", "three", 3)])
    assert committed_generations(path) == [0, 1]
    got = {
        r["point_id"]: (r["payload"], r["score"])
        for r in read_upsert_mirror(spark, path, SCHEMA).collect()
    }
    # b upserted, a untouched, c inserted
    assert got == {"a": ("one", 1), "b": ("two-v2", 22), "c": ("three", 3)}


def test_failed_job_leaves_committed_state_untouched(spark, tmp_path):
    """The abort path: a task failure mid-job must not produce a new
    generation or disturb the previous one — the manifest is the only
    commit point."""
    path = str(tmp_path / "mirror")
    _df(spark, [("a", "one", 1)]).write.format("upsert_mirror").option(
        "path", path
    ).mode("append").save()
    with pytest.raises(Exception):
        _df(spark, [("a", "poison", 9), ("z", "zz", 0)]).repartition(1).write.format(
            "upsert_mirror"
        ).option("path", path).option("fail_marker", "a").mode("append").save()
    assert committed_generations(path) == [0]
    got = {r["point_id"]: r["payload"] for r in read_upsert_mirror(spark, path, SCHEMA).collect()}
    assert got == {"a": "one"}


def test_parallel_tasks_one_generation(spark, tmp_path):
    """Every task writes its own file; one job commit = one generation
    with one manifest covering all of them."""
    import json

    path = str(tmp_path / "mirror")
    df = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("point_id"),
        F.lit("p").alias("payload"),
        F.col("id").alias("score"),
    ).repartition(8)
    df.write.format("upsert_mirror").option("path", path).mode("append").save()
    assert committed_generations(path) == [0]
    manifest = json.load(open(os.path.join(path, "gen-0", "manifest.json")))
    assert manifest["n_rows"] == 100
    assert len(manifest["files"]) >= 1
    assert read_upsert_mirror(spark, path, SCHEMA).count() == 100
