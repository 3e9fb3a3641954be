"""Scalar quantization (SQ8): int8 vector compression.

The third compression tier of the similarity stack — brute/rp-LSH/IVF
search full vectors, PQ compresses to m codebook codes, SQ8 compresses
each DIMENSION to an int8: 4x smaller than float32 with near-exact
ranking (faiss SQ8 / Lucene int8 HNSW storage).  Where PQ's ADC is a
table lookup, SQ8's scoring is an INTEGER dot product scaled by two
per-vector floats — exact integer arithmetic inside the hot loop, which
is also what makes the whole operator hash-certifiable cross-engine
(PQ needed a seed codebook for that; SQ8 needs nothing).

Per-vector symmetric quantization: scale = max|v_i| / 127,
code_i = clamp(round(v_i / scale), -127, 127); approx dot(a, b) =
scale_a * scale_b * sum(ca_i * cb_i).  The integer dot is exact in any
order (|sum| <= dim * 127^2); the final two-multiply scaling is an
exact-input IEEE chain.  Zero vectors get scale 0 and all-zero codes
(scored 0 against everything) — guarded, not NaN.

Scale shape: encode is map-only (pure per-row expressions, no shuffle);
top-k scoring broadcasts the encoded queries and shuffles only the
per-(query, id) WindowGroupLimit — same plan skeleton as
brute_force_topk but scanning codes ~4x smaller than the vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sq8_encode(
    vecs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, scale, codes array<int>): the encoded table — persist it as
    the compressed index artifact."""
    from lawlm_spark.functions.text import let_bound

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def enc(vv):
        scale = F.array_max(F.transform(vv, F.abs)) / F.lit(127.0)
        codes = F.when(
            scale == 0,
            F.transform(vv, lambda x: F.lit(0)),
        ).otherwise(
            F.transform(
                vv,
                lambda x: F.greatest(
                    F.lit(-127.0), F.least(F.lit(127.0), F.round(x / scale))
                ).cast("int"),
            )
        )
        return F.struct(scale.alias("scale"), codes.alias("codes"))

    return vecs.select(
        F.col(id_col),
        let_bound(v, enc).alias("_e"),
    ).select(id_col, "_e.scale", "_e.codes")


def sq8_topk(
    enc: DataFrame,
    enc_queries: DataFrame,
    id_col: str = "vec_id",
    qid_col: str = "qid",
    k: int = 5,
) -> DataFrame:
    """(qid, id, score, rank): top-k by the scaled integer dot product.
    Both inputs are sq8_encode outputs (queries renamed to qid)."""
    q = enc_queries.select(
        F.col(qid_col),
        F.col("scale").alias("_qs"),
        F.col("codes").alias("_qc"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("codes"), F.col("_qc"), lambda a, b: a * b),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    scored = enc.crossJoin(F.broadcast(q)).select(
        qid_col,
        id_col,
        F.round(F.col("scale") * F.col("_qs") * dot.cast("double"), 6).alias(
            "score"
        ),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
