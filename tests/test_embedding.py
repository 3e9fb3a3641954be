"""mapInPandas embedding operator O26/O27."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.functions.vectors import fake_embedding
from lawlm_spark.operators.embedding import (
    BGE_QUERY_PREFIX,
    embed_texts,
    fake_embed_one,
)


def test_mapinpandas_matches_column_expression(spark, docs):
    d = docs.limit(10).select("doc_id", "text")
    via_udf = embed_texts(d, "text", "e1")
    via_expr = d.select("doc_id", fake_embedding(F.col("text")).alias("e2"))
    joined = via_udf.join(via_expr, "doc_id")
    maxdiff = joined.select(
        F.max(
            F.expr("aggregate(zip_with(e1, e2, (x,y) -> abs(x-y)), 0D, (a,v) -> greatest(a,v))")
        ).alias("m")
    ).collect()[0]["m"]
    assert maxdiff == 0.0  # bit-equal: same md5 math on both paths


def test_bge_prefix_only_for_queries():
    base = fake_embed_one("hello")
    prefixed = fake_embed_one(BGE_QUERY_PREFIX + "hello")
    assert base != prefixed  # prefix changes the fake vector...


def test_query_prefix_applied_iff_bge(spark):
    d = spark.createDataFrame([(1, "hello")], ["id", "t"])
    no_prefix = embed_texts(d, "t", "v", model_name="fake", is_query=True).collect()[0]["v"]
    assert no_prefix == fake_embed_one("hello")  # 'fake' has no 'bge' -> no prefix


def test_schema_and_row_passthrough(spark, docs):
    d = docs.limit(5)
    out = embed_texts(d, "text")
    assert out.columns == d.columns + ["embedding"]
    assert out.count() == 5
    assert all(len(r["embedding"]) == 64 for r in out.collect())
