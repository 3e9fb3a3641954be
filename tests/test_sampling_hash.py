"""Deterministic hash-based sampling / splitting / training-mix
(operators/sampling.py).  The layout-stability claims df.sample cannot
make are asserted here; cross-engine value parity is the d17/d18/d19
oracle's job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.sampling import (
    hash_sample,
    hash_split,
    hash_uniform,
    training_mix,
)


def test_hash_sample_layout_stable(spark, docs):
    """Membership is identical across repartitionings — the property
    df.sample lacks (its RNG stream is per-partition)."""
    base = sorted(
        r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, "s").collect()
    )
    for parts in (1, 7):
        re = hash_sample(docs.repartition(parts), "doc_id", 0.3, "s")
        assert sorted(r["doc_id"] for r in re.collect()) == base
    assert 0 < len(base) < docs.count()


def test_hash_sample_incremental_safe(spark, docs):
    """Appending rows never flips the verdict on existing keys."""
    half = docs.filter("doc_id % 2 = 0")
    small = {r["doc_id"] for r in hash_sample(half, "doc_id", 0.3, "s").collect()}
    full = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, "s").collect()}
    assert small == {i for i in full if i % 2 == 0}


def test_hash_sample_fraction_bounds(spark, docs):
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_hash_salts_independent(spark, docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, "a").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, "b").collect()}
    assert a != b  # overwhelmingly likely on 500 docs


def test_hash_split_disjoint_exhaustive(spark, docs):
    sp = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in sp.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # exhaustive (every row exactly one split)
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic across repartition
    again = hash_split(docs.repartition(5), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted((r["doc_id"], r["split"]) for r in again.collect()) == sorted(
        (r["doc_id"], r["split"]) for r in sp.collect()
    )


def test_hash_split_validates_weights(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {})
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": -1.0, "b": 2.0})


def test_training_mix_hits_budgets(spark, docs):
    wc = docs.withColumn("n_tokens", F.size(F.split(F.col("text"), r"\s+")).cast("long"))
    totals = {
        r["lang"]: r["t"]
        for r in wc.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # budget half of the biggest stratum, everything of the smallest
    langs = sorted(totals, key=totals.get)
    big, small = langs[-1], langs[0]
    targets = {big: totals[big] / 2, small: totals[small] * 10}
    mixed = training_mix(wc, "doc_id", "lang", "n_tokens", targets)
    got = {
        r["lang"]: r["t"]
        for r in mixed.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    }
    assert set(got) == {big, small}  # strata without a target are dropped
    assert got[small] == totals[small]  # frac capped at 1 → kept whole
    # downsampled stratum lands near its budget (hash sampling is
    # per-document, so allow generous tolerance on a 500-doc corpus)
    assert 0.25 * totals[big] < got[big] < 0.8 * totals[big]


def test_training_mix_deterministic(spark, docs):
    wc = docs.withColumn("n_tokens", F.lit(1).cast("long"))
    targets = {"en": 100.0}
    a = sorted(r["doc_id"] for r in training_mix(wc, "doc_id", "lang", "n_tokens", targets).collect())
    b = sorted(
        r["doc_id"]
        for r in training_mix(
            wc.repartition(9), "doc_id", "lang", "n_tokens", targets
        ).collect()
    )
    assert a == b and len(a) > 0


def test_hash_uniform_range(spark, docs):
    mm = docs.select(
        F.min(hash_uniform(F.col("doc_id"))).alias("lo"),
        F.max(hash_uniform(F.col("doc_id"))).alias("hi"),
    ).collect()[0]
    assert 0.0 <= mm["lo"] and mm["hi"] < 1.0


def test_temperature_mix_upweights_low_resource(spark):
    from lawlm_spark.operators.sampling import temperature_mix

    # stratum 'big': 900 docs of weight 10; 'small': 100 docs of weight 10
    rows = [(i, "big" if i < 900 else "small", 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    out = temperature_mix(df, "doc_id", "lang", "w", total_budget=5000.0, alpha=0.5)
    kept = {r["lang"]: 0 for r in out.collect()}
    for r in out.collect():
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    # alpha=0.5 shares: sqrt(9000):sqrt(1000) = 3:1 -> budgets 3750/1250;
    # small's budget (1250) exceeds its mass (1000) -> frac capped at 1.0
    assert kept["small"] == 100  # every low-resource doc kept
    frac_big = kept["big"] / 900
    assert 0.30 < frac_big < 0.55  # ~3750/9000 ≈ 0.42 expected

    # deterministic: rerun keeps the identical id set
    again = temperature_mix(df, "doc_id", "lang", "w", total_budget=5000.0, alpha=0.5)
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}


def test_cluster_balance_caps_and_assigns_seeds_to_themselves(spark):
    from lawlm_spark.operators.sampling import cluster_balanced_sample
    from lawlm_spark.sources.testdata import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = cluster_balanced_sample(vecs, n_clusters=8, cap=30)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster"], []).append(r["vec_id"])
    assert all(len(v) <= 30 for v in per.values())
    # seed vector i IS centroid i (distance 0) -> assigned to cluster i,
    # and being the lowest ids they survive any cap
    seeds = {r["vec_id"]: r["cluster"] for r in rows if r["vec_id"] < 8}
    assert seeds == {i: i for i in range(8)}


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from lawlm_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 if i else 1e9) for i in range(200)]  # row 0 is huge
    df = spark.createDataFrame(rows, "k long, w double")
    got1 = sorted(r["k"] for r in weighted_sample(df, "k", "w", 20).collect())
    got2 = sorted(r["k"] for r in weighted_sample(df, "k", "w", 20).collect())
    assert got1 == got2 and len(got1) == 20
    assert 0 in got1  # weight 1e9 vs 1: clock ~1e-9x smaller, always in
    # a different salt draws a different sample
    got3 = sorted(
        r["k"] for r in weighted_sample(df, "k", "w", 20, salt="other").collect()
    )
    assert got3 != got1 and 0 in got3


def test_weighted_sample_per_stratum_counts(spark, docs):
    from pyspark.sql import functions as F

    from lawlm_spark.operators.sampling import weighted_sample

    out = weighted_sample(
        docs.select("doc_id", "lang", F.col("n_chars").cast("double").alias("w")),
        "doc_id", "w", 15, stratum_col="lang",
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(15, full[lang])


def test_weighted_sample_global_plans_take_ordered(spark, docs):
    from pyspark.sql import functions as F

    from lawlm_spark.operators.sampling import weighted_sample

    df = docs.select("doc_id", F.col("n_chars").cast("double").alias("w"))
    plan = (
        weighted_sample(df, "doc_id", "w", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_group_split_never_straddles(spark):
    """Every duplicate component lands entirely inside one split — the
    leakage guard group_split exists for."""
    from pyspark.sql import functions as F

    from lawlm_spark.operators.sampling import group_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # chains A~B~C (transitive) plus isolated pairs
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 60, 3)]
        + [(i + 1, i + 2) for i in range(0, 60, 3)],
        "id_a long, id_b long",
    )
    out = group_split(docs, "doc_id", pairs, {"train": 0.8, "test": 0.2})
    assert out.count() == 200
    straddle = (
        out.groupBy("group_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert straddle == 0
    # chain members share one group even though (i, i+2) never paired
    g = {r["doc_id"]: r["group_id"] for r in out.filter("doc_id < 3").collect()}
    assert g[0] == g[1] == g[2]


def test_group_split_counterfactual_doc_keyed_leaks(spark):
    """The naive doc-keyed split DOES straddle at least one dup pair on
    the same data — the failure mode the group key removes."""
    from lawlm_spark.operators.sampling import hash_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    pairs = [(i, i + 1) for i in range(0, 200, 2)]
    by_doc = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", {"train": 0.8, "test": 0.2}).collect()
    }
    assert any(by_doc[a] != by_doc[b] for a, b in pairs)
