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
