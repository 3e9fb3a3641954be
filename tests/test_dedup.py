"""Dedup family: exact, Jaccard, MinHash+LSH (candidate-gated), SimHash,
embedding near-dup."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.dedup import (
    dedup_exact,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    exact_dupes,
    jaccard_on_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    shingle_table,
    simhash32,
)


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and again tomorrow maybe"),  # near dup
        (4, "completely different text about database query engines and spark plans"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_exact_dedup(spark):
    c = _corpus(spark)
    dupes = exact_dupes(c, "id", "text").collect()
    assert len(dupes) == 1 and dupes[0]["n_dupes"] == 2 and dupes[0]["keeper_id"] == 1
    kept = dedup_exact(c, "id", "text")
    assert kept.count() == 3
    assert sorted(r["id"] for r in kept.collect()) == [1, 3, 4]


def test_jaccard_hand_computed(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], ["id", "text"])
    # shingles(3): {abc, bcd} vs {abc, bce} -> intersection 1, union 3
    row = jaccard_pairs(df, "id", "text", n=3, min_jaccard=0.0).collect()[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert abs(row["jaccard"] - 1 / 3) < 1e-6


def test_minhash_gated_equals_candidates_join_jaccard(spark):
    c = _corpus(spark)
    cand = lsh_candidate_pairs(c, "id", "text", num_hashes=8, bands=4)
    full = jaccard_pairs(c, "id", "text", min_jaccard=0.3)
    expected = sorted(
        map(tuple, cand.join(full, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard").collect())
    )
    got = sorted(
        map(tuple, minhash_dedup_pairs(c, "id", "text", num_hashes=8, bands=4, min_jaccard=0.3).collect())
    )
    assert got == expected
    assert got, "exact dup pair must survive LSH + Jaccard"


def test_jaccard_on_pairs_no_full_self_join(spark):
    """The gated verifier never scans non-candidate pairs."""
    c = _corpus(spark)
    sh = shingle_table(c, "id", "text")
    only_pair = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    rows = jaccard_on_pairs(only_pair, sh, "id", min_jaccard=0.0).collect()
    assert len(rows) == 1 and rows[0]["jaccard"] == 1.0


def test_simhash_identical_docs_collide(spark):
    c = _corpus(spark)
    h = {r["id"]: r["simhash"] for r in simhash32(c, "id", "text").collect()}
    assert h[1] == h[2]
    assert h[1] != h[4]
    assert all(0 <= v < 2**32 for v in h.values())


def test_embedding_lsh_pairs_subset_of_brute(spark):
    from lawlm_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    brute = set(map(tuple, embedding_dup_pairs(emb, "vec_id", "embedding", 0.3).select("id_a", "id_b").collect()))
    lsh = set(map(tuple, embedding_dup_pairs_lsh(emb, "vec_id", "embedding", 64, 0.3, 8).select("id_a", "id_b").collect()))
    assert lsh <= brute  # bucketing only prunes, never invents pairs


def test_containment_catches_subset_that_jaccard_misses(spark):
    from lawlm_spark.operators.dedup import containment_pairs, jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"word{i} item{i} thing{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler)], "doc_id long, text string"
    )
    jac = jaccard_pairs(docs, "doc_id", "text", n=3, min_jaccard=0.5).collect()
    assert jac == []  # subset drowns in the big doc's union
    got = containment_pairs(docs, "doc_id", "text", n=3, min_containment=0.8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_small"], r["id_big"]) == (1, 2) and r["containment"] == 1.0


def test_containment_direction_normalization_and_ties(spark):
    from lawlm_spark.operators.dedup import containment_pairs

    # 9 = small contained in 3 (big); identical twins 5/6 tie -> lower id small
    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon"), (3, big), (5, big), (6, big)],
        "doc_id long, text string",
    )
    rows = {
        (r["id_small"], r["id_big"]): r["containment"]
        for r in containment_pairs(docs, "doc_id", "text", n=3, min_containment=0.9).collect()
    }
    assert rows[(9, 3)] == 1.0 and rows[(9, 5)] == 1.0 and rows[(9, 6)] == 1.0
    assert rows[(5, 6)] == 1.0 and rows[(3, 5)] == 1.0 and rows[(3, 6)] == 1.0
    assert all(s < b or docs.count() for (s, b) in rows)


def test_prefix_filter_equals_brute_force(spark, docs):
    """The exactness claim: prefix filtering finds EVERY pair brute-force
    all-pairs Jaccard finds, at several thresholds."""
    from lawlm_spark.operators.dedup import jaccard_pairs, prefix_filter_pairs

    corpus = docs.limit(60).select("doc_id", "text")
    for t in (0.3, 0.5, 0.7):
        brute = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in jaccard_pairs(corpus, "doc_id", "text", 3, t).collect()
        }
        pref = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in prefix_filter_pairs(corpus, "doc_id", "text", 3, t).collect()
        }
        assert pref == brute, f"t={t}: prefix {len(pref)} vs brute {len(brute)}"


def test_prefix_filter_prunes_candidates(spark, docs):
    """The prefix join must touch far fewer candidate pairs than the
    quadratic all-pairs space — the point of the filter."""
    from pyspark.sql import Window
    from lawlm_spark.operators.dedup import shingle_table

    corpus = docs.limit(60).select("doc_id", "text")
    n_docs = corpus.count()
    sh = shingle_table(corpus, "doc_id", "text", 3)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("doc_id").orderBy("_df", "shingle")
    ranked = sh.join(dfreq, "shingle").select(
        "doc_id", "shingle", "set_size", F.row_number().over(w).alias("_rk")
    )
    plen = F.col("set_size") - F.ceil(F.lit(0.7) * F.col("set_size")) + 1
    prefix = ranked.filter(F.col("_rk") <= plen)
    a = prefix.select(F.col("doc_id").alias("id_a"), "shingle")
    b = prefix.select(F.col("doc_id").alias("id_b"), "shingle")
    n_cand = (
        a.join(b, "shingle").filter("id_a < id_b").select("id_a", "id_b")
        .distinct().count()
    )
    assert n_cand < n_docs * (n_docs - 1) / 2 / 4  # >4x fewer than all-pairs


def test_lsh_tuning_picks_sensible_banding(spark):
    from lawlm_spark.operators.dedup import lsh_tuning

    # 16 hashes, target 0.5: the chooser lands below the target with
    # high detection probability at the target
    cfg = lsh_tuning(0.5, 16)
    assert cfg["bands"] * cfg["rows"] == 16
    assert cfg["threshold"] <= 0.5
    assert cfg["p_at_min_jaccard"] > 0.6
    # high threshold -> few, wide bands; low threshold -> many narrow bands
    assert lsh_tuning(0.9, 16)["rows"] > lsh_tuning(0.2, 16)["rows"]
    # the d5-certified config (8 hashes, 4 bands) is what 0.2 selects
    low = lsh_tuning(0.2, 8)
    assert (low["bands"], low["rows"]) == (8, 1) or low["threshold"] <= 0.2


def test_embedding_lsh_hot_bucket_guard(spark):
    """max_bucket refines oversized rp-LSH buckets with extra planes
    (r13, the semdedup-guard design): the pair budget shrinks, near-
    identical vectors still pair, and below the cap the guard is inert."""
    import hashlib

    # deterministic uniform directions (md5-derived, no RNG): parallel
    # vectors are rare, so the refinement's 2^extra split is visible
    rows = []
    for i in range(240):
        v = [
            (int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
             % 2001 - 1000) / 1000.0
            for j in range(8)
        ]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # num_planes=1 -> two coarse buckets, both far over a cap of 50.
    # min_cos=-1 keeps every generated pair: the count IS the pair work.
    unguarded = embedding_dup_pairs_lsh(
        emb, "vec_id", "embedding", 8, -1.0, num_planes=1
    ).count()
    guarded = embedding_dup_pairs_lsh(
        emb, "vec_id", "embedding", 8, -1.0, num_planes=1,
        max_bucket=50, extra_planes=4,
    ).count()
    assert guarded < unguarded / 3, (guarded, unguarded)
    # near-identical vectors survive refinement (same signs on the
    # extra planes)
    twin = [1.0, 0.5, -0.25, 0.125, 1.0, 0.5, -0.25, 0.125]
    twins = spark.createDataFrame(
        [(1000, twin), (1001, [x * 1.0001 for x in twin])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs_lsh(
            emb.union(twins), "vec_id", "embedding", 8, 0.999,
            num_planes=1, max_bucket=50, extra_planes=4,
        ).collect()
    }
    assert (1000, 1001) in got
    # inert below the cap: identical pair set to the unguarded operator
    base = set(map(tuple, embedding_dup_pairs_lsh(
        emb, "vec_id", "embedding", 8, 0.9, num_planes=1
    ).collect()))
    inert = set(map(tuple, embedding_dup_pairs_lsh(
        emb, "vec_id", "embedding", 8, 0.9, num_planes=1, max_bucket=10**9
    ).collect()))
    assert base == inert


def test_lsh_refined_guard_plan_shape(spark):
    """The ADVICE r13 claim fix, pinned: unarmed the bucket join
    shuffles on the coarse sign-pattern bucket only (2 exchanges, no
    Window); armed, each join side pays one coarse-bucket window
    shuffle for the size count feeding the refined-key join shuffle —
    4 exchanges total, all keyed hashpartitioning on a bucket
    attribute (never SinglePartition)."""
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
         for i in range(60)],
        "vec_id long, embedding array<float>",
    )

    def exchange_lines(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan, [ln for ln in plan.splitlines() if "Exchange" in ln]

    plan_u, ex_u = exchange_lines(
        embedding_dup_pairs_lsh(emb, "vec_id", "embedding", 8, -1.0,
                                num_planes=2)
    )
    assert len(ex_u) == 2 and "Window" not in plan_u, plan_u
    assert all("hashpartitioning(bucket#" in ln for ln in ex_u), plan_u

    plan_a, ex_a = exchange_lines(
        embedding_dup_pairs_lsh(emb, "vec_id", "embedding", 8, -1.0,
                                num_planes=2, max_bucket=10,
                                extra_planes=3)
    )
    assert len(ex_a) == 4 and "Window" in plan_a, plan_a
    assert all("hashpartitioning(bucket#" in ln for ln in ex_a), plan_a
    assert "SinglePartition" not in plan_a, plan_a
