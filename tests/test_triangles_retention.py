"""Triangle counting (operators/triangles.py) and cohort retention
(operators/timeseries.py::retention_cohorts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.triangles import (
    oriented_edges,
    triangle_counts,
    triangles,
    undirected_edges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k4_has_four_triangles(spark):
    k4 = _edges(
        spark, [(a, b) for a in range(4) for b in range(4) if a < b]
    )
    tri = triangles(k4).collect()
    assert len(tri) == 4
    counts = {r["node"]: r["n_triangles"] for r in triangle_counts(k4).collect()}
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}  # each corner in C(3,2) triangles


def test_star_has_no_triangles(spark):
    star = _edges(spark, [(0, i) for i in range(1, 30)])
    assert triangles(star).count() == 0


def test_triangle_found_once_regardless_of_input_orientation(spark):
    """Duplicate edges, reversed edges, and self-loops must not double-
    count: the canonicalization eats them."""
    messy = _edges(
        spark,
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)],
    )
    tri = triangles(messy).collect()
    assert len(tri) == 1
    assert (tri[0]["x"], tri[0]["y"], tri[0]["z"]) == (1, 2, 3)


def test_orientation_starves_hubs(spark):
    """The degree-ordered orientation gives hubs IN-edges only: the
    hub's wedge work is zero, which is the whole point (no d^2 blowup
    at the skewed node)."""
    # hub 0 touches everyone; nodes 1..5 form a small clique
    edges = [(0, i) for i in range(1, 40)] + [
        (a, b) for a in range(1, 6) for b in range(1, 6) if a < b
    ]
    o = oriented_edges(undirected_edges(_edges(spark, edges)))
    hub_out = o.filter("lo = 0").count()
    assert hub_out == 0
    # all triangles still found: C(5,3) inside the clique, plus one per
    # clique PAIR through the hub (the hub touches every clique node)
    assert triangles(_edges(spark, edges)).count() == 10 + 10


def test_retention_cohorts_known_grid(spark):
    from lawlm_spark.operators.timeseries import retention_cohorts

    week = 604_800_000_000
    rows = []
    # users 1,2: first event week 0; user 1 returns week 1; user 2 never
    # user 3: first event week 1, returns week 2
    for uid, wk in [(1, 0), (2, 0), (1, 1), (3, 1), (3, 2)]:
        rows.append((uid, wk * week // 1_000_000))
    ev = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    got = {
        (r["cohort_period"], r["period_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention"],
        )
        for r in retention_cohorts(ev).collect()
    }
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)
    assert got[(1, 0)] == (1, 1, 1.0)
    assert got[(1, 1)] == (1, 1, 1.0)
    assert (0, 2) not in got  # nobody from cohort 0 active in week 2


def test_debounce_burst_collapses_to_opener(spark):
    from pyspark.sql import functions as F
    from lawlm_spark.operators.timeseries import debounce

    sec = 1_000_000
    rows = [
        (1, "c", 1, 0),            # opener
        (1, "c", 2, 5 * sec),      # within gap of e1 -> drop
        (1, "c", 3, 9 * sec),      # within gap of e2 (chained) -> drop
        (1, "c", 4, 100 * sec),    # far -> keep
        (2, "c", 5, 3 * sec),      # other key: opener
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, us long"
    ).select(
        "user_id", "event_type", "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )
    kept = {
        r["event_id"]
        for r in debounce(ev, ["user_id", "event_type"], gap_us=10 * sec).collect()
    }
    assert kept == {1, 4, 5}


def test_feature_hash_deterministic_and_signed(spark):
    from pyspark.sql import functions as F
    from lawlm_spark.functions.vectors import hashed_features

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha beta alpha")],
        "doc_id long, text string",
    )
    out = hashed_features(docs, "doc_id", "text", dim=64)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["idx"]] = r["weight"]
    assert by_doc[1] == by_doc[2]  # identical text -> identical features
    assert all(0 <= i < 64 for i in by_doc[1])
    # alpha appears twice, beta once: weights are +/-2 and +/-1 (no collision
    # between two tokens in a 64-bucket table is overwhelmingly likely; if
    # they collide the sum is +/-1 or +/-3 — accept either shape)
    mags = sorted(abs(w) for w in by_doc[1].values())
    assert mags in ([1, 2], [1], [3])
