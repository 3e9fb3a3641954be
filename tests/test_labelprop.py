"""Label propagation (operators/labelprop.py)."""

from __future__ import annotations

from lawlm_spark.operators.labelprop import community_sizes, label_propagation


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_two_cliques_with_bridge_form_two_communities(spark):
    """Two 4-cliques joined by one bridge edge: after a few rounds each
    clique agrees on its own min label."""
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    pairs = _pairs(spark, c1 + c2 + [(3, 10)])
    labels = {r["node"]: r["label"] for r in label_propagation(pairs, iterations=4).collect()}
    # clique 1 all agree; clique 2 all agree; the two communities differ
    assert len({labels[n] for n in range(4)}) == 1
    assert len({labels[n] for n in range(10, 14)}) == 1
    assert labels[0] != labels[12]


def test_labelprop_deterministic_under_repartition(spark):
    c = [(a, b) for a in range(6) for b in range(6) if a < b]
    pairs = _pairs(spark, c + [(20, 21), (21, 22)])
    base = sorted(map(tuple, label_propagation(pairs, iterations=3).collect()))
    shuf = sorted(
        map(tuple, label_propagation(pairs.repartition(7), iterations=3).collect())
    )
    assert base == shuf


def test_community_sizes(spark):
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    labels = label_propagation(_pairs(spark, c1), iterations=3)
    sizes = community_sizes(labels).collect()
    assert len(sizes) == 1 and sizes[0]["n_members"] == 4


def test_modularity_two_cliques_positive_split_negative(spark):
    """Separating two cliques scores positive contributions; lumping
    everything in one community scores ~0 (Q of the trivial
    partition)."""
    from lawlm_spark.operators.labelprop import (
        label_propagation,
        modularity_contributions,
    )

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    pairs = _pairs(spark, c1 + c2 + [(3, 10)])
    labels = label_propagation(pairs, iterations=4)
    contribs = modularity_contributions(pairs, labels).collect()
    assert len(contribs) == 2
    q = sum(r["contribution"] for r in contribs)
    assert q > 0.3  # near-ideal two-community split of two cliques
    # trivial partition: all nodes one label -> Q = 1 - 1 = 0
    one = labels.selectExpr("node", "0 AS label")
    trivial = modularity_contributions(pairs, one).collect()
    assert len(trivial) == 1 and abs(trivial[0]["contribution"]) < 1e-9


def test_modularity_driver_side_fold_matches_hand_computation(spark):
    """Pins the documented caller pattern (labelprop.py: callers fold
    the scalar Q driver-side from the per-community contributions):
    two triangles + one bridge, hand-computed Newman Q.

    m = 7 edges; communities A={0,1,2}, B={10,11,12}; e_in = 3 each;
    d_tot = 7 each (two degree-2 nodes + one degree-3 node).
    Q = 2 * (3/7 - (7/14)^2) = 6/7 - 1/2 = 0.357142857...
    Per-contribution round(.,6) = 0.178571 -> folded Q = 0.357142.
    """
    import pytest

    from lawlm_spark.operators.labelprop import modularity_contributions

    tri1 = [(0, 1), (0, 2), (1, 2)]
    tri2 = [(10, 11), (10, 12), (11, 12)]
    pairs = _pairs(spark, tri1 + tri2 + [(2, 10)])
    labels = spark.createDataFrame(
        [(n, 0) for n in (0, 1, 2)] + [(n, 1) for n in (10, 11, 12)],
        "node long, label long",
    )
    contribs = modularity_contributions(pairs, labels).collect()
    assert len(contribs) == 2
    by_label = {r["label"]: r for r in contribs}
    for lbl in (0, 1):
        r = by_label[lbl]
        assert (r["n_members"], r["e_in"], r["d_tot"]) == (3, 3, 7)
        assert r["contribution"] == pytest.approx(0.178571, abs=5e-7)
    q = sum(r["contribution"] for r in contribs)  # the driver-side fold
    assert q == pytest.approx(0.357142, abs=1e-9)


def test_modularity_contribution_never_emits_signed_zero(spark):
    """The d68 driver-hash class (VERDICT r7 item 1): a community with
    e_in=0 whose (d_tot/2m)^2 term rounds away must emit +0.0, not
    -0.0.  Chain of 1500 edges, one lone degree-1 node in its own
    community: contribution = round(-(1/3000)^2, 6) = -0.0 before the
    `+ 0.0` normalization."""
    import math

    from pyspark.sql import functions as F

    from lawlm_spark.operators.labelprop import modularity_contributions

    pairs = _pairs(spark, [(i, i + 1) for i in range(1500)])
    nodes = pairs.select(F.col("id_a").alias("node")).unionAll(
        pairs.select(F.col("id_b"))
    ).distinct()
    labels = nodes.withColumn(
        "label", F.when(F.col("node") == 0, F.lit(1)).otherwise(F.lit(0))
    )
    rows = {r["label"]: r for r in modularity_contributions(pairs, labels).collect()}
    lone = rows[1]
    assert (lone["e_in"], lone["d_tot"]) == (0, 1)
    assert lone["contribution"] == 0.0
    assert math.copysign(1.0, lone["contribution"]) == 1.0  # +0.0, not -0.0


def test_selfcheck_canon_is_signed_zero_strict():
    """The prediction instrument must be at least as strict as the
    driver's hash (VERDICT r7 item 2): selfcheck's canon must NOT
    collapse -0.0 and 0.0."""
    import selfcheck

    assert selfcheck._canon(0.0) != selfcheck._canon(-0.0)
    assert selfcheck._canon(1.5) == selfcheck._canon(1.5)


def test_selfcheck_signed_zero_detector():
    """The advisory -0.0 scanner flags latent d68-class hazards even
    when both engines agree, including inside nested arrays."""
    import numpy as np

    import selfcheck

    assert not selfcheck._has_signed_zero([(1, 0.0, "x")])
    assert selfcheck._has_signed_zero([(1, -0.0, "x")])
    assert selfcheck._has_signed_zero([([1.0, -0.0],)])
    assert selfcheck._has_signed_zero([(np.float64(-0.0),)])
    assert not selfcheck._has_signed_zero([(np.array([0.0, 2.5]),)])


def test_lpa_round_plan(spark):
    """Per-round plan audit (VERDICT r6 item 3): over materialized
    inputs, the argmax is WindowGroupLimit-pruned (each node's
    candidate labels collapse to 1 row partial-side, BEFORE the final
    sort materializes), there is no single-partition stage, and every
    exchange is keyed hashpartitioning."""
    from pyspark.sql import functions as F

    from lawlm_spark.operators.labelprop import lpa_round

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("b", "a"), ("c", "b")], "src string, dst string"
    ).localCheckpoint()
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    plan = lpa_round(e, labels)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2  # partial + final prune
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "hashpartitioning" in line or "BroadcastExchange" in line, line
