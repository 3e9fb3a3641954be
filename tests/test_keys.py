"""O18 key derivation: uuid5 must be byte-exact vs RFC 4122 / Python's
uuid.uuid5 (reference parity: data_extraction.py:288 point ids — breaking
this breaks idempotent upserts)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from lawlm_spark.functions.keys import chunk_id, chunk_key, surrogate_id, uuid5

NAMES = ["", "abc", "1_2_0", "123_456_7", "héllo wörld ünïcode", "hello", "a" * 500]


def test_uuid5_matches_python(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], ["name"])
    rows = df.select("name", uuid5(F.col("name")).alias("u")).collect()
    for r in rows:
        expected = str(uuid.uuid5(uuid.NAMESPACE_DNS, r["name"]))
        assert r["u"] == expected, f"uuid5({r['name']!r}) = {r['u']} != {expected}"


def test_uuid5_shape(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], ["name"])
    for r in df.select(uuid5(F.col("name")).alias("u")).collect():
        parts = r["u"].split("-")
        assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
        assert parts[2][0] == "5"  # version nibble
        assert parts[3][0] in "89ab"  # RFC 4122 variant


def test_chunk_keys(spark):
    df = spark.createDataFrame([(12, 34, 0)], ["d", "o", "i"])
    row = df.select(
        chunk_key(F.col("d"), F.col("o"), F.col("i")).alias("ck"),
        chunk_id(F.col("o"), F.col("i")).alias("ci"),
        surrogate_id(chunk_key(F.col("d"), F.col("o"), F.col("i"))).alias("sid"),
    ).collect()[0]
    assert row["ck"] == "12_34_0"  # chunk.py:12 format
    assert row["ci"] == "34_0"  # chunk.py:19 format
    import hashlib

    assert row["sid"] == hashlib.md5(b"12_34_0").hexdigest()
