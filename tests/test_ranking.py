"""Ranking: top-k windows, RRF fusion, threshold — determinism under
repartitioning is the core invariant (value-hash stability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.ranking import ranked, rrf_fuse, threshold, top_k


def _scores(spark):
    rows = [("q1", f"d{i}", float(100 - i)) for i in range(20)] + [
        ("q2", f"d{i}", float(50 + (i % 7))) for i in range(20)
    ]
    return spark.createDataFrame(rows, ["qid", "doc", "score"])


def test_top_k(spark):
    out = top_k(_scores(spark), ["qid"], F.col("score").desc(), 3, tiebreak=["doc"])
    got = {(r["qid"], r["doc"], r["rn"]) for r in out.collect()}
    assert ("q1", "d0", 1) in got and ("q1", "d2", 3) in got
    assert sum(1 for g in got if g[0] == "q2") == 3


def test_rrf_deterministic_under_repartition(spark):
    s = _scores(spark)
    def fuse(df):
        a = ranked(df, ["qid"], F.col("score"), ["doc"])
        b = ranked(df, ["qid"], F.length("doc").cast("double"), ["doc"])
        f = rrf_fuse([a, b], ["qid"], ["doc"])
        return sorted(map(tuple, f.select("qid", "doc", F.round("fused_score", 9)).collect()))

    assert fuse(s) == fuse(s.repartition(17))


def test_rrf_score_formula(spark):
    df = spark.createDataFrame([("q", "d", 1), ("q", "d", 3)], ["qid", "doc", "rank"])
    out = rrf_fuse([df], ["qid"], ["doc"]).collect()[0]
    assert abs(out["fused_score"] - (1 / 61 + 1 / 63)) < 1e-12


def test_threshold(spark):
    out = threshold(_scores(spark), "score", 95.0)
    assert out.count() == 6  # q1 scores 100..95
