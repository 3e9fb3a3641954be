"""Label propagation communities (Raghavan et al. 2007), synchronous
and fully deterministic.

The fourth graph operator (components = connectivity, pagerank =
centrality, triangles = local density, LPA = COMMUNITIES): each round,
every node adopts the most frequent label among its neighbors, ties to
the smallest label.  Classic LPA breaks ties randomly and updates
asynchronously; both choices are non-reproducible on a cluster, so this
implementation pins (a) synchronous rounds (all nodes update from the
same snapshot) and (b) the (max count, min label) total order — the
same determinism discipline as d37's fixed-point pagerank.  Like d37,
a FIXED iteration count is part of the contract: sync LPA can oscillate
on bipartite-ish structures, so the result is a well-defined snapshot,
not a claimed fixed point (callers wanting stability run components on
the high-agreement edges instead).

One shuffle per round (neighbor-label delivery + the (node, label)
count share a key chain), labels lineage-cut per round via the
components.py checkpoint policy.  The oracle unrolls the rounds as
chained CTEs — every step is counts + argmax, pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lawlm_spark.operators.components import _lineage_cut


def label_propagation(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iterations: int = 3,
    use_reliable_checkpoint: bool | None = None,
) -> DataFrame:
    """(node, label) after `iterations` synchronous rounds."""
    spark = pairs.sparkSession
    if use_reliable_checkpoint is None:
        use_reliable_checkpoint = spark.sparkContext.getCheckpointDir() is not None
    reliable = bool(use_reliable_checkpoint)
    edges = _lineage_cut(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct(),
        reliable,
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    from pyspark.sql import Window

    for _ in range(iterations):
        delivered = edges.join(
            labels, edges.dst == labels.node
        ).select(edges.src.alias("node"), "label")
        counts = delivered.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("_n")
        )
        w = Window.partitionBy("node").orderBy(F.desc("_n"), F.col("label"))
        labels = _lineage_cut(
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label"),
            reliable,
        )
    return labels


def community_sizes(labels: DataFrame) -> DataFrame:
    """(label, n_members): community size distribution."""
    return labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
