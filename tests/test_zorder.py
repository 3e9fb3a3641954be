"""operators/zorder.py: Morton key exactness + layout locality."""

from __future__ import annotations

import os
import tempfile
import uuid as uuidlib

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.zorder import (
    file_ranges,
    write_zordered,
    zorder_key,
    zorder_key_sql,
)


def _morton2(x, y, bits):
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_morton(spark):
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    # bounds (0,3) with bits=2: rank is the identity on 0..3
    out = df.withColumn("z", zorder_key(["x", "y"], [(0, 3), (0, 3)], bits=2))
    for r in out.collect():
        assert r["z"] == _morton2(r["x"], r["y"], 2)


def test_rank_spans_full_bit_range(spark):
    df = spark.createDataFrame([(0,), (999,)], "x long")
    out = df.withColumn("z", zorder_key(["x"], [(0, 999)], bits=16)).collect()
    z = {r["x"]: r["z"] for r in out}
    assert z[0] == 0
    assert (1 << 15) < z[999] < (1 << 16)  # hi maps near (not past) 2^bits


def test_empty_bounds_rejected(spark):
    with pytest.raises(ValueError, match="empty bound range"):
        zorder_key(["x"], [(5, 4)], bits=4)


def test_layout_locality_beats_single_column_sort(spark):
    """Each file's min/max envelope must be narrow in BOTH z columns;
    a single-column sort gives narrow envelopes in one and full-span
    envelopes in the other."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    lo_k, hi_k, lo_c, hi_c = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey"),
        F.min("o_custkey"), F.max("o_custkey"),
    ).first()
    base = os.path.join(tempfile.gettempdir(), f"zorder_{uuidlib.uuid4().hex[:8]}")
    zpath, spath = f"{base}/z", f"{base}/sorted"
    write_zordered(
        orders, zpath, ["o_orderkey", "o_custkey"],
        [(lo_k, hi_k), (lo_c, hi_c)], num_files=16,
    )
    orders.repartitionByRange(16, "o_orderkey").write.parquet(spath)

    def mean_envelope(path, col, span):
        df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
        rows = file_ranges(df, col).collect()
        return sum(r["hi"] - r["lo"] for r in rows) / len(rows) / span

    # z layout: both columns' per-file envelopes well under the span
    assert mean_envelope(zpath, "o_orderkey", hi_k - lo_k) < 0.5
    assert mean_envelope(zpath, "o_custkey", hi_c - lo_c) < 0.5
    # single-column sort: the unsorted column's envelope stays ~full span
    assert mean_envelope(spath, "o_custkey", hi_c - lo_c) > 0.8
    # and the layout is a permutation, not a transformation
    got = spark.read.parquet(zpath)
    assert got.orderBy("o_orderkey").collect() == orders.orderBy("o_orderkey").collect()


def test_sql_twin_matches_spark_key(spark):
    import duckdb

    rows = [(i, (i * 37) % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    bounds = [(0, 199), (0, 999)]
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", zorder_key(["a", "b"], bounds, bits=8)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = zorder_key_sql(["a", "b"], bounds, bits=8)
    for a, b, z in con.execute(f"SELECT a, b, {sql} FROM t").fetchall():
        assert got[(a, b)] == z
