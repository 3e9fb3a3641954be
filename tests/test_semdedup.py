"""operators/semdedup.py: within-cluster semantic dedup."""

from __future__ import annotations

import math

from lawlm_spark.operators.semdedup import cluster_sizes, semdedup, semdedup_pairs


def _vec(angle, dim=4):
    """Unit vector in the plane of dims 0/1, padded to `dim`."""
    v = [math.cos(angle), math.sin(angle)] + [0.0] * (dim - 2)
    return [float(x) for x in v]


def _df(spark, rows, dim=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_greedy_sweep_drops_later_ranked_duplicates(spark):
    # single cluster (k=1): seeds = vec 1's vector as the centroid.
    # vecs 1 and 2 nearly parallel (cos ~ 1), vec 3 orthogonal.
    rows = [
        (1, _vec(0.0)),
        (2, _vec(0.001)),
        (3, _vec(math.pi / 2)),
    ]
    out = semdedup(_df(spark, rows), n_clusters=1, dim=4, min_cos=0.95)
    kept = sorted(r["vec_id"] for r in out.collect())
    # one of {1, 2} dropped, the orthogonal vector kept
    assert 3 in kept and len(kept) == 2


def test_cross_cluster_duplicates_are_never_compared(spark):
    # identical vectors forced into DIFFERENT clusters (k=2, seeds are
    # vecs 1 and 2 which are orthogonal; 3 copies 1, 4 copies 2)
    rows = [
        (1, _vec(0.0)),
        (2, _vec(math.pi / 2)),
        (3, _vec(0.0 + 1e-4)),
        (4, _vec(math.pi / 2 + 1e-4)),
    ]
    pairs = semdedup_pairs(_df(spark, rows), n_clusters=2, dim=4, min_cos=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # only the within-cluster pairs exist — (1,3) and (2,4); the equally
    # similar cross-cluster combinations are structurally absent
    assert got == {(1, 3), (2, 4)}


def test_sweep_order_is_farthest_from_centroid_first(spark):
    # k=1, centroid = vec 1.  vec 2 sits at 0.3 rad (farther from the
    # centroid), vec 3 at 0.25 rad; 2 and 3 are mutual dups (cos(0.05)
    # ~ 0.9988) but neither dups the centroid (cos(0.25) ~ 0.969 < τ).
    tau = 0.99
    rows = [(1, _vec(0.0)), (2, _vec(0.3)), (3, _vec(0.25))]
    out = semdedup(_df(spark, rows), n_clusters=1, dim=4, min_cos=tau)
    kept = sorted(r["vec_id"] for r in out.collect())
    # sweep ranks 2 before 3 (lower centroid_cos), so 3 is dropped even
    # though 2 has the larger id — order is similarity-based, not id-based
    assert kept == [1, 2]


def test_greedy_vs_closure_semantics_documented_case(spark):
    # chain: a~b, b~c, a!~c.  Greedy sweep (centroid = a, so sweep order
    # is c, b, a by ascending centroid cos) keeps c, drops b (dup of c),
    # keeps a (not a dup of the KEPT c? no — greedy checks EARLIER
    # RANKED, dropped or not: a is within τ of b (rank 2) -> dropped).
    tau = 0.9988  # cos(0.025) ≈ 0.99969 ≥ τ; cos(0.05) ≈ 0.99875 < τ
    rows = [(1, _vec(0.0)), (2, _vec(0.025)), (3, _vec(0.05))]
    out = semdedup(_df(spark, rows), n_clusters=1, dim=4, min_cos=tau)
    kept = sorted(r["vec_id"] for r in out.collect())
    # ranks: 3 (farthest), then 2, then 1.  2 dups 3 -> dropped;
    # 1 dups 2 (earlier-ranked, even though dropped) -> dropped.
    assert kept == [3]


def _skewed_fixture(spark, n=240, dim=8):
    """One degenerate cluster holding ~all vectors: n_clusters=1 puts
    every row in cluster 0.  Deterministic pseudo-random spread (no RNG
    in tests) so the rp-LSH sub-buckets are populated realistically."""
    rows = []
    for i in range(n):
        v = [math.sin(0.7 * i + 1.3 * j) + 0.1 * math.cos(2.1 * i * (j + 1)) for j in range(dim)]
        rows.append((i, v))
    return _df(spark, rows, dim=dim)


def test_hot_cluster_guard_bounds_the_pair_budget(spark):
    # min_cos=-1 keeps EVERY generated pair, so the row count IS the
    # pair work the shuffle partition carries.
    vecs = _skewed_fixture(spark)
    n = 240
    unguarded = semdedup_pairs(vecs, n_clusters=1, dim=8, min_cos=-1.0).count()
    assert unguarded == n * (n - 1) // 2  # the quadratic, unbounded
    guarded = semdedup_pairs(
        vecs, n_clusters=1, dim=8, min_cos=-1.0, max_cluster_size=50, sub_planes=4
    ).count()
    # 16 sub-buckets: expected ~1/16 of the quadratic; assert a loose
    # but meaningful budget (any real split beats 1/3)
    assert guarded < unguarded / 3, (guarded, unguarded)


def test_hot_cluster_guard_keeps_near_identical_pairs(spark):
    # two near-identical vectors inside the oversized cluster: the
    # rp-LSH sub-split must not separate them (theta ~ 0 -> same signs)
    vecs = _skewed_fixture(spark, n=200)
    twin_a = [1.0, 0.5, -0.25, 0.125, 1.0, 0.5, -0.25, 0.125]
    twin_b = [x * 1.0001 for x in twin_a]
    extra = _df(spark, [(1000, twin_a), (1001, twin_b)], dim=8)
    pairs = semdedup_pairs(
        vecs.union(extra), n_clusters=1, dim=8, min_cos=0.999,
        max_cluster_size=50, sub_planes=4,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1000, 1001) in got


def test_hot_cluster_guard_inert_below_the_cap(spark):
    # cap above every cluster size -> the guarded kept set is IDENTICAL
    # to the unguarded one (the d38 oracle row must stay green)
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = semdedup(vecs, n_clusters=8, dim=64, min_cos=0.8)
    guarded = semdedup(
        vecs, n_clusters=8, dim=64, min_cos=0.8,
        max_cluster_size=10**9, sub_planes=4,
    )
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, guarded.collect()))
    assert a == b


def test_cluster_sizes_diagnostic(spark):
    vecs = _skewed_fixture(spark, n=100)
    sizes = {r["cluster"]: r["n"] for r in cluster_sizes(vecs, n_clusters=1, dim=8).collect()}
    assert sizes == {0: 100}


def test_testdata_shrinks_but_keeps_every_cluster(spark):
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kept = semdedup(vecs, n_clusters=8, dim=64, min_cos=0.8)
    rows = kept.collect()
    assert 0 < len(rows) <= vecs.count()
    assert len({r["cluster"] for r in rows}) == 8


def test_hot_cluster_guard_plan_shape(spark):
    """The ADVICE r13 claim fix, pinned: unarmed the pair join shuffles
    on cluster only (2 exchanges, no _sub anywhere); armed it shuffles
    on the refined (cluster, _sub) key, and each join side pays one
    additional cluster-only window shuffle for the size count — 4
    exchanges total, every one keyed (never SinglePartition)."""
    vecs = _skewed_fixture(spark, n=60)

    def exchange_lines(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan, [ln for ln in plan.splitlines() if "Exchange" in ln]

    plan_u, ex_u = exchange_lines(
        semdedup_pairs(vecs, n_clusters=1, dim=8, min_cos=-1.0)
    )
    assert len(ex_u) == 2 and "_sub" not in plan_u, plan_u
    assert all("hashpartitioning(cluster#" in ln for ln in ex_u), plan_u

    plan_a, ex_a = exchange_lines(
        semdedup_pairs(
            vecs, n_clusters=1, dim=8, min_cos=-1.0,
            max_cluster_size=10, sub_planes=3,
        )
    )
    assert len(ex_a) == 4, plan_a
    refined = [ln for ln in ex_a if "_sub" in ln]
    coarse = [ln for ln in ex_a if "_sub" not in ln]
    assert len(refined) == 2 and len(coarse) == 2, plan_a
    assert all("hashpartitioning(cluster#" in ln for ln in ex_a), plan_a
    assert "SinglePartition" not in plan_a, plan_a


def test_pair_scope_repartition_pins_n_clusters_partitions(spark):
    """r19: the pair join's work is quadratic per cluster while its
    input is corpus-linear, so AQE's byte-sized coalescing collapsed
    the whole sweep onto one task.  semdedup/semdedup_pairs now pin the
    pair-join exchanges at n_clusters partitions (REPARTITION_BY_NUM,
    exempt from AQE coalescing) — a problem-derived count, never a core
    count.  n_clusters=1 keeps the pre-r19 shape (no explicit
    repartition, ENSURE_REQUIREMENTS exchanges)."""
    vecs = _skewed_fixture(spark, n=60)

    plan = (
        semdedup_pairs(vecs, n_clusters=4, dim=8, min_cos=-1.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    pinned = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "REPARTITION_BY_NUM" in ln
    ]
    assert len(pinned) == 2, plan
    assert all("hashpartitioning(cluster#" in ln and ", 4)" in ln for ln in pinned), plan

    plan1 = (
        semdedup_pairs(vecs, n_clusters=1, dim=8, min_cos=-1.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "REPARTITION_BY_NUM" not in plan1, plan1
