"""Pareto-frontier (skyline) operator tests (operators/skyline.py, r14).

Covers: semantics vs a brute-force python reference on synthetic 2-D /
3-D data (ties, duplicates, totally-ordered and anti-correlated
shapes), equality of the 2-D Catalyst path and the generic N-D path,
the max_candidates guard, and the plan pins behind the scale claims —
the 2-D path's SinglePartition window sits above the aggregate only,
and the corpus side is never repartitioned.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.skyline import pareto_front, pareto_front_2d


def _brute_skyline(rows, metric_idx):
    """Reference: keep row iff no other row dominates it."""
    out = []
    for t in rows:
        dominated = any(
            all(o[i] >= t[i] for i in metric_idx)
            and any(o[i] > t[i] for i in metric_idx)
            for o in rows
        )
        if not dominated:
            out.append(t)
    return sorted(out)


def _mk(spark, rows, schema="id long, m1 long, m2 long"):
    return spark.createDataFrame(rows, schema)


ROWS_2D = [
    (1, 10, 1),
    (2, 9, 5),
    (3, 9, 5),   # duplicate metrics: both kept (neither dominates)
    (4, 9, 4),   # dominated by 2/3 (same m1, larger m2)
    (5, 5, 9),
    (6, 4, 9),   # dominated by 5 (larger m1, same m2)
    (7, 1, 10),
    (8, 10, 1),  # ties with 1 on both: kept
    (9, 3, 3),   # interior: dominated
]


def test_pareto_2d_matches_brute(spark):
    df = _mk(spark, ROWS_2D)
    got = sorted(
        tuple(r) for r in pareto_front_2d(df, "m1", "m2").select("id", "m1", "m2").collect()
    )
    assert got == _brute_skyline(ROWS_2D, (1, 2))


def test_pareto_generic_matches_2d(spark):
    df = _mk(spark, ROWS_2D)
    cols = ["id", "m1", "m2"]
    a = sorted(tuple(r) for r in pareto_front_2d(df, "m1", "m2").select(*cols).collect())
    b = sorted(tuple(r) for r in pareto_front(df, ["m1", "m2"]).select(*cols).collect())
    assert a == b


def test_pareto_2d_totally_ordered(spark):
    """Correlated metrics: one maximal row dominates everything."""
    rows = [(i, i, i) for i in range(20)]
    df = _mk(spark, rows)
    got = pareto_front_2d(df, "m1", "m2").select("id", "m1", "m2").collect()
    assert [tuple(r) for r in got] == [(19, 19, 19)]


def test_pareto_2d_anti_chain(spark):
    """Perfectly anti-correlated metrics: every row is on the front."""
    rows = [(i, i, 100 - i) for i in range(30)]
    df = _mk(spark, rows)
    assert pareto_front_2d(df, "m1", "m2").count() == 30


def test_pareto_3d_matches_brute(spark):
    """Generic path on 3 metrics vs the brute reference (deterministic
    hash-derived values exercise ties across every axis pair)."""
    rows = [
        (i, (i * 7) % 13, (i * 11) % 13, (i * 5) % 13) for i in range(60)
    ]
    df = _mk(spark, rows, "id long, m1 long, m2 long, m3 long")
    got = sorted(tuple(r) for r in pareto_front(df, ["m1", "m2", "m3"]).collect())
    assert got == _brute_skyline(rows, (1, 2, 3))


def test_pareto_generic_guard(spark):
    """max_candidates trips BEFORE the quadratic join on anti-chain data."""
    rows = [(i, i, 100000 - i) for i in range(50)]
    df = _mk(spark, rows)
    with pytest.raises(ValueError, match="local-skyline survivors"):
        pareto_front(df, ["m1", "m2"], max_candidates=10)


def test_pareto_validates_metric_cols(spark):
    """Degenerate metric lists raise clearly instead of IndexError /
    ambiguous-join behavior (the map_symbols ADVICE class)."""
    df = _mk(spark, [(0, 1, 2)])
    with pytest.raises(ValueError, match="non-empty"):
        pareto_front(df, [])
    with pytest.raises(ValueError, match="distinct"):
        pareto_front(df, ["m1", "m1"])
    with pytest.raises(ValueError, match="distinct"):
        pareto_front_2d(df, "m1", "m1")


def test_pareto_randomized_vs_brute(spark):
    """Fixed-seed random trials (the test_properties_ops idiom): small
    value ranges force heavy ties/duplicates; both paths must equal the
    brute reference, and each other, on every draw."""
    import random

    rng = random.Random(1404)
    for trial in range(4):
        lo, hi = 0, rng.choice([3, 10, 50])
        rows = [
            (i, rng.randint(lo, hi), rng.randint(lo, hi))
            for i in range(rng.randint(1, 120))
        ]
        df = _mk(spark, rows)
        want = _brute_skyline(rows, (1, 2))
        cols = ["id", "m1", "m2"]
        a = sorted(tuple(r) for r in pareto_front_2d(df, "m1", "m2").select(*cols).collect())
        b = sorted(tuple(r) for r in pareto_front(df, ["m1", "m2"]).select(*cols).collect())
        assert a == want, f"2d path diverged on trial {trial}"
        assert b == want, f"generic path diverged on trial {trial}"


def test_pareto_2d_plan_shape(spark):
    """The scale pins: exactly one corpus-side exchange (the m1 hash
    aggregate), the SinglePartition exchange feeds the window over that
    aggregate (never scan rows), and the join back is broadcast."""
    rows = [(i, (i * 7) % 97, (i * 13) % 89) for i in range(500)]
    df = _mk(spark, rows)
    plan = (
        pareto_front_2d(df, "m1", "m2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    hashed = [ln for ln in ex if "hashpartitioning" in ln]
    single = [ln for ln in ex if "SinglePartition" in ln]
    # corpus groupBy(m1) + the broadcast build's hash side, plus one
    # SinglePartition for the bounded window over the aggregate
    assert len(single) == 1, plan
    assert all("m1#" in ln for ln in hashed), plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # partial aggregation happened below the shuffle (map-side combine)
    assert "partial_max" in plan, plan


def test_local_skyline_scan_matches_brute():
    """Direct pin of the r15 running-skyline scan (VERDICT r14 item 4):
    identical survivors to the pairwise dominance definition on a known
    randomized batch with heavy ties/duplicates, a total order (one
    survivor), and an anti-chain (all survive) — no Spark session, the
    prune is pure pandas/numpy."""
    import random

    import pandas as pd

    from lawlm_spark.operators.skyline import _local_skyline

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(6), rng.randrange(6), rng.randrange(6))
        for i in range(500)
    ]
    batch = pd.DataFrame(rows, columns=["id", "m1", "m2", "m3"])
    got = _local_skyline(batch, ["m1", "m2", "m3"])
    want_ids = {
        t[0] for t in rows
        if not any(
            all(o[i] >= t[i] for i in (1, 2, 3))
            and any(o[i] > t[i] for i in (1, 2, 3))
            for o in rows
        )
    }
    assert set(got["id"]) == want_ids
    # survivors come back in input row order (iloc on the sorted keep set)
    assert list(got["id"]) == sorted(got["id"])

    total = pd.DataFrame(
        [(i, i, i) for i in range(100)], columns=["id", "m1", "m2"]
    )
    got_total = _local_skyline(total, ["m1", "m2"])
    assert list(got_total["id"]) == [99]

    anti = pd.DataFrame(
        [(i, i, 99 - i) for i in range(100)], columns=["id", "m1", "m2"]
    )
    got_anti = _local_skyline(anti, ["m1", "m2"])
    assert list(got_anti["id"]) == list(range(100))

    dup = pd.DataFrame(
        [(0, 5, 5), (1, 5, 5), (2, 5, 5), (3, 4, 6)],
        columns=["id", "m1", "m2"],
    )
    assert list(_local_skyline(dup, ["m1", "m2"])["id"]) == [0, 1, 2, 3]
