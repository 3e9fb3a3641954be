"""Connected components over a pair table (iterative min-label
propagation) — the transitive-closure step a correct near-dup
canonicalization needs.

Pair-based dedup (drop id_b of every verified pair) is greedy: with a
chain a~b, b~c but a!~c it drops both b and c even though c's only
anchor (b) is itself dropped.  Component-based dedup labels every doc
with the minimum id reachable through dup edges and keeps exactly one
doc (the label) per component — deterministic and chain-correct.

Algorithm: min-label propagation.  labels(i) starts as i; each round
every node takes the min label among itself and its neighbors; stop
when no label changes.  Rounds = graph diameter (dup clusters are tiny
— near-dup graphs are unions of small cliques/chains — so 2-4 rounds in
practice).  Each round is one shuffle (join on node + min-agg); the
classic O(log n)-round variants (large-star/small-star) swap in behind
the same signature if a corpus ever produces deep chains.

The iteration is driver-side (a loop of Spark jobs with a convergence
check), like KMeans — iterative algorithms are inherently multi-action;
each *round* is still fully distributed.  The converged frame is
persisted per round and the previous round unpersisted, so peak cache
is one label table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """(node, component_id): min reachable node id over undirected pairs.

    `pairs` is an edge list (one row per undirected edge, any
    orientation).  Nodes appearing only as src or only as dst are
    handled; isolated nodes (no edges) are absent — union the full node
    set downstream if every node needs a label (dedup_by_component does).

    The RETURNED label frame stays persisted (its lineage nests one join
    per iteration — unpersisting it would make every downstream action
    replay the whole iteration chain).  It is one small row per
    edge-touched node; pass `cache_registry` to collect the handle and
    unpersist after your final consuming action.
    """
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component_id", F.col("node"))
    )
    labels.persist()
    labels.count()
    for _ in range(max_iter):
        # each node adopts the min label among itself and its neighbors
        neighbor_lbls = (
            edges.join(labels, edges.dst == labels.node)
            .select(edges.src.alias("node"), "component_id")
        )
        new_labels = (
            labels.select("node", "component_id")
            .union(neighbor_lbls)
            .groupBy("node")
            .agg(F.min("component_id").alias("component_id"))
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component_id") != F.col("o.component_id"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if cache_registry is not None:
        cache_registry.append(labels)
    return labels


def dedup_by_component(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Keep exactly one doc per duplicate component: the minimum id.

    Docs not in any pair are their own component and survive.  The
    chain-correct replacement for drop-id_b-of-each-pair."""
    comp = connected_components(pairs, src_col, dst_col)
    labeled = docs.join(comp, docs[id_col] == comp.node, "left").select(
        docs["*"],
        F.coalesce("component_id", F.col(id_col)).alias("component_id"),
    )
    return labeled.filter(F.col(id_col) == F.col("component_id")).drop("component_id")
