"""Randomized invariant tests for the fourth-session operator families
(fixed seeds — deterministic CI): graph ops vs pure-Python brute force,
split-safety on random duplicate graphs, sketch algebra, and a
hypothesis check on the Bloom mask fold (pure Python, no Spark)."""

from __future__ import annotations

import itertools
import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _random_graph(rng, n_nodes, n_edges):
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _brute_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = {}
    eset = set(edges)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tri = tuple(sorted((a, b, c)))
            count[tri] = None
    per_node = {}
    for tri in count:
        for n in tri:
            per_node[n] = per_node.get(n, 0) + 1
    return per_node


def test_triangles_match_brute_on_random_graphs(spark):
    from lawlm_spark.operators.triangles import triangle_counts

    rng = random.Random(406)
    for trial in range(4):
        edges = _random_graph(rng, 25, 80)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
        }
        assert got == _brute_triangles(edges), f"trial {trial}"


def test_group_split_no_straddle_random_graphs(spark):
    """Random duplicate graphs, random weights: no component ever
    straddles splits — the leakage guarantee under arbitrary topology
    (chains, stars, cliques all arise at these densities)."""
    from lawlm_spark.operators.sampling import group_split

    rng = random.Random(607)
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(120)], "doc_id long, text string"
    )
    for trial in range(3):
        edges = _random_graph(rng, 120, 70)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        out = group_split(
            docs, "doc_id", pairs, {"train": 0.7, "val": 0.1, "test": 0.2},
            salt=f"t{trial}",
        )
        straddle = (
            out.groupBy("group_id")
            .agg(F.count_distinct("split").alias("k"))
            .filter("k > 1")
            .count()
        )
        assert straddle == 0, f"trial {trial}"
        assert out.count() == 120


def test_kmv_union_commutative_associative(spark, events):
    from lawlm_spark.operators.sketches import kmv_sketch, kmv_union

    parts = [
        kmv_sketch(events.filter(f"event_id % 3 = {i}"), "user_id", 32)
        for i in range(3)
    ]

    def rows(df):
        return sorted(r["h"] for r in df.collect())

    ab_c = kmv_union(kmv_union(parts[0], parts[1], 32), parts[2], 32)
    c_ba = kmv_union(parts[2], kmv_union(parts[1], parts[0], 32), 32)
    assert rows(ab_c) == rows(c_ba)
    whole = kmv_sketch(events, "user_id", 32)
    assert rows(ab_c) == rows(whole)


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=255), max_size=40))
def test_bloom_mask_fold_preserves_every_bit(bits):
    """Pure-Python property: folding arbitrary bit positions into
    signed 64-bit words and reading them back via the same shift logic
    bloom_prune compiles loses nothing and invents nothing."""
    num_bits = 256
    words = [0] * (num_bits // 64)
    for b in bits:
        words[b // 64] |= 1 << (b % 64)
    folded = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    def read(pos):
        w = folded[pos // 64]
        if w < 0:
            w += 1 << 64  # unsigned reinterpretation == shiftrightunsigned
        return (w >> (pos % 64)) & 1

    for pos in range(num_bits):
        assert read(pos) == (1 if pos in bits else 0)


def test_association_rules_repartition_invariant(spark):
    from lawlm_spark.operators.association import association_rules

    rng = random.Random(808)
    rows = [
        (rng.randrange(40), f"item{rng.randrange(12)}") for _ in range(400)
    ]
    b = spark.createDataFrame(rows, "bk long, it string")
    base = sorted(
        map(tuple, association_rules(b, "bk", "it", 2, 15).collect())
    )
    shuf = sorted(
        map(tuple, association_rules(b.repartition(7), "bk", "it", 2, 15).collect())
    )
    assert base == shuf


def _brute_funnel(events, stages):
    """Pure-Python windowFunnel reference: first-completion times with
    the strict-after tie policy (funnel.py's documented contract)."""
    by_user = {}
    for uid, et, us in events:
        by_user.setdefault(uid, []).append((et, us))
    out = {}
    for uid, evs in by_user.items():
        times = []
        prev = None
        for k, stage in enumerate(stages):
            cand = [
                us for et, us in evs
                if et == stage and (k == 0 or (prev is not None and us > prev))
            ]
            t = min(cand) if cand and (k == 0 or prev is not None) else None
            times.append(t)
            prev = t
        if times[0] is not None:
            out[uid] = (times, sum(1 for t in times if t is not None))
    return out


def test_funnel_one_pass_matches_brute_on_random_streams(spark):
    """The r8 pivot-to-arrays rewrite vs a pure-Python reference on
    random event streams — same-timestamp ties, missing stages,
    out-of-order arrival, and repeat completions all arise at these
    densities."""
    from lawlm_spark.operators.funnel import funnel_counts, funnel_times

    rng = random.Random(408)
    stages = ["view", "click", "purchase"]
    for trial in range(4):
        events = [
            (
                rng.randrange(12),                    # user
                rng.choice(stages + ["noise"]),       # type (incl. non-funnel)
                rng.randrange(20),                    # small ts domain -> ties
            )
            for _ in range(150)
        ]
        df = spark.createDataFrame(
            [(u, t, ts * 1_000_000) for u, t, ts in events],
            "user_id long, event_type string, ts_us long",
        ).select(
            "user_id", "event_type", F.timestamp_micros("ts_us").alias("ts")
        )
        expected = _brute_funnel(
            [(u, t, ts * 1_000_000) for u, t, ts in events], stages
        )
        got = {
            r["user_id"]: (
                [r[f"t_{s}_us"] for s in stages],
                r["stages_completed"],
            )
            for r in funnel_times(df, stages).collect()
        }
        assert got == expected, f"trial {trial}"
        # the report layer: n_users at stage k == brute count
        counts = {
            r["stage_index"]: r["n_users"]
            for r in funnel_counts(df, stages).collect()
        }
        for k in range(1, len(stages) + 1):
            brute_k = sum(1 for _, c in expected.values() if c >= k)
            assert counts.get(k, 0) == brute_k, (trial, k)


def test_hist_quantiles_one_pass_matches_formula(spark):
    """The r8 one-pass (cross-join-probs) hist_quantiles vs a direct
    Python replay of the rank/interpolation formula over random
    integer histograms."""
    from lawlm_spark.operators.sketches import hist_bins, hist_quantiles

    rng = random.Random(409)
    lo, hi, n_bins = 0.0, 100.0, 20
    width = (hi - lo) / n_bins
    for trial in range(3):
        vals = [rng.uniform(-5, 105) for _ in range(400)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        probs = [0.1, 0.25, 0.5, 0.9]
        bins = hist_bins(df, "v", lo, hi, n_bins)
        got = {
            round(r["p"], 6): r["q_est"]
            for r in hist_quantiles(bins, lo, hi, n_bins, probs).collect()
        }
        # python replay: clamp to edge bins, rank r = ceil(p*N), linear
        # interpolation inside the hit bin
        counts = {}
        for v in vals:
            b = min(n_bins - 1, max(0, int((v - lo) // width)))
            counts[b] = counts.get(b, 0) + 1
        n = len(vals)
        import math
        for p in probs:
            r = math.ceil(p * n)
            cum = 0
            for b in sorted(counts):
                if cum < r <= cum + counts[b]:
                    exp = round(lo + width * (b + (r - cum) / counts[b]), 6)
                    assert got[round(p, 6)] == exp, (trial, p)
                    break
                cum += counts[b]


# ------------- r17: randomized identity trials for the new algebras


def test_fold_change_feed_identity_random_trials(spark):
    """fold(state(S), diff(S, S')) == distributive_state(S') on random
    mutation batches — inserts, deletes, value updates, and group
    migrations all drawn at random (fixed seed, 5 trials)."""
    from lawlm_spark.operators.relational import (
        distributive_state,
        fold_change_feed,
    )
    from lawlm_spark.streaming.cdc import snapshot_diff

    rng = random.Random(1701)
    for trial in range(5):
        n = rng.randrange(20, 60)
        old_rows = [
            (k, rng.randrange(0, 4), rng.randrange(-50, 200))
            for k in range(n)
        ]
        # mutate: drop ~1/4, update ~1/3 (value and/or group), insert new
        new_rows = []
        for k, g, v in old_rows:
            r = rng.random()
            if r < 0.25:
                continue  # delete
            if r < 0.58:
                new_rows.append((
                    k,
                    rng.randrange(0, 4) if rng.random() < 0.5 else g,
                    rng.randrange(-50, 200),
                ))
            else:
                new_rows.append((k, g, v))
        for k in range(n, n + rng.randrange(5, 15)):
            new_rows.append((k, rng.randrange(0, 4), rng.randrange(-50, 200)))

        schema = "k long, g long, v long"
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        diff = snapshot_diff(old, new, ["k"])
        state = distributive_state(old, {"grp": F.col("g")}, F.col("v"))
        folded = fold_change_feed(
            state, diff,
            {"grp": F.col("g_old")}, {"grp": F.col("g_new")},
            F.col("v_old"), F.col("v_new"),
        )
        direct = distributive_state(new, {"grp": F.col("g")}, F.col("v"))
        rows = lambda df: sorted(  # noqa: E731
            (r["grp"], r["m_cnt"], r["m_sum"]) for r in df.collect()
        )
        assert rows(folded) == rows(direct), f"trial {trial}"


def test_scd2_increment_identity_random_trials(spark):
    """Folding a random ts-ordered change log in random batch cuts ==
    one scd2_intervals over the whole log (fixed seed, 5 trials)."""
    from lawlm_spark.operators.relational import (
        scd2_apply_increment,
        scd2_intervals,
    )

    rng = random.Random(1702)
    for trial in range(5):
        n_keys = rng.randrange(3, 8)
        rows = []
        seq = 0
        for ts in range(1, rng.randrange(30, 60)):
            if rng.random() < 0.6:
                seq += 1
                rows.append((
                    rng.randrange(n_keys), ts,
                    "abcd"[rng.randrange(4)], seq,
                ))
        schema = "k long, ts long, attr string, seq long"
        log = spark.createDataFrame(rows, schema)
        full = scd2_intervals(log, "k", "ts", "attr", ["seq"])

        max_ts = max(r[1] for r in rows)
        cuts = sorted(rng.sample(range(2, max_ts), min(2, max_ts - 2)))
        bounds = [0] + cuts + [max_ts]
        dim = scd2_intervals(
            log.filter(F.col("ts") <= bounds[1]), "k", "ts", "attr", ["seq"]
        )
        for lo, hi in zip(bounds[1:], bounds[2:]):
            dim = scd2_apply_increment(
                dim,
                log.filter((F.col("ts") > lo) & (F.col("ts") <= hi)),
                "k", "ts", "attr", ["seq"],
            )
        ivals = lambda df: sorted(  # noqa: E731
            (r["k"], r["attr"], r["valid_from"], r["valid_to"],
             r["is_current"])
            for r in df.collect()
        )
        assert ivals(dim) == ivals(full), f"trial {trial}"
