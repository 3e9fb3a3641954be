"""BPE-ish tokenization, rolling fingerprint, observe() metrics."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from lawlm_spark.functions.text import (
    bpe_ish_token_count,
    bpe_ish_tokenize,
    rolling_fingerprint,
)
from lawlm_spark.operators.relational import observed


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["t"]).select(col.alias("v")).collect()[0]["v"]


def test_bpe_ish_tokenize(spark):
    got = _one(spark, "It's a test-case 42!", bpe_ish_tokenize(F.col("t")))
    assert got == ["It", "'s", " a", " test", "-", "case", " 42", "!"]
    assert _one(spark, "It's a test-case 42!", bpe_ish_token_count(F.col("t"))) == 8


def test_rolling_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", rolling_fingerprint(F.col("t")))
    b = _one(spark, "gamma beta alpha", rolling_fingerprint(F.col("t")))
    c = _one(spark, "alpha  beta   gamma", rolling_fingerprint(F.col("t")))
    assert a != b  # order matters (unlike md5 fingerprint)
    assert a == c  # tokenizer absorbs whitespace differences
    assert 0 <= a < 2**31 - 1


def test_observed_metrics_single_pass(spark, events):
    obs = Observation("counters")
    df = observed(events, obs, {"rows": F.count(F.lit(1)), "users": F.approx_count_distinct("user_id")})
    n = df.count()  # the action that materializes the metrics
    assert obs.get["rows"] == n
    assert obs.get["users"] > 0
