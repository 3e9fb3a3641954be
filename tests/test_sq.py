"""SQ8 scalar quantization (operators/sq.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.sq import sq8_encode, sq8_topk
from lawlm_spark.sources.testdata import load_table
from tests.conftest import SF_DIR


def test_sq8_reconstruction_error_bounded(spark):
    """|v_i - scale*code_i| <= scale/2 per dimension (round-to-nearest),
    i.e. relative error <= 1/254 of the vector's max component."""
    vecs = load_table(spark, SF_DIR, "embeddings")
    enc = sq8_encode(vecs)
    joined = vecs.join(enc, "vec_id").select(
        F.aggregate(
            F.zip_with(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                F.transform(F.col("codes"), lambda c: c.cast("double") * F.col("scale")),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        (F.col("scale") / 2 * 1.0000001).alias("bound"),
    )
    assert joined.filter(F.col("max_err") > F.col("bound")).count() == 0


def test_sq8_codes_in_range_and_map_only(spark):
    vecs = load_table(spark, SF_DIR, "embeddings")
    enc = sq8_encode(vecs)
    bad = enc.select(
        F.size(F.filter(F.col("codes"), lambda c: (c > 127) | (c < -127))).alias("n")
    ).filter("n > 0")
    assert bad.count() == 0
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # encode is map-only


def test_sq8_topk_recall_vs_brute_cosine(spark):
    """SQ8 ranking must recover most of the exact top-10 (norm-scaled
    dot vs cosine differ, so compare against exact DOT product)."""
    vecs = load_table(spark, SF_DIR, "embeddings")
    enc = sq8_encode(vecs)
    q_raw = vecs.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    got = {
        (r["qid"], r["vec_id"])
        for r in sq8_topk(enc, sq8_encode(q_raw, id_col="qid"), k=10).collect()
    }
    exact_dot = vecs.crossJoin(
        F.broadcast(
            q_raw.select("qid", F.col("embedding").alias("_qv"))
        )
    ).select(
        "qid",
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                F.transform("_qv", lambda x: x.cast("double")),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("dot"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("dot"), "vec_id")
    exact = {
        (r["qid"], r["vec_id"])
        for r in exact_dot.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 10")
        .collect()
    }
    assert len(got & exact) >= len(exact) * 0.8


def test_sq8_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    enc = sq8_encode(df)
    rows = {r["vec_id"]: r for r in enc.collect()}
    assert rows[1]["scale"] == 0.0 and set(rows[1]["codes"]) == {0}
    assert set(rows[2]["codes"]) == {127}
