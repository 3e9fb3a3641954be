"""Triangle counting via degree-ordered edge orientation.

The third graph operator (with components.py and pagerank.py): triangle
participation is the local-clustering signal behind community detection
and near-dup cluster QA (a dup component whose members form few
triangles is a chain of borderline pairs — likely over-merged; a clique
is a true duplicate group).

The naive wedge join explodes on hubs: a degree-d node generates d^2
wedges, and real co-occurrence graphs are power-law.  The standard fix
(Suri & Vassilvitskii 2011, "Counting triangles and the curse of the
last reducer") orients every undirected edge from its lower-(degree,id)
endpoint to its higher one — a total order, so the orientation is
acyclic and every triangle survives as EXACTLY one wedge at its
order-minimal vertex plus one closing edge.  Wedge work drops from
sum(deg^2) to sum(out-deg^2) where out-degree is bounded by ~sqrt(|E|)
— the hub's d^2 disappears because hubs sit at the TOP of the order and
get in-edges only.

Three shuffles total (degree agg, wedge join, closing join), all keyed
on node/edge ids — no driver-side state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(a, b) with a < b, distinct, self-loops dropped — the canonical
    undirected edge set every function here consumes."""
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"),
            F.greatest(src, dst).alias("b"),
        )
        .distinct()
    )


def oriented_edges(und: DataFrame) -> DataFrame:
    """Orient each undirected edge by the (degree, id) total order:
    (lo, hi) plus hi's order key for wedge ordering downstream."""
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    j = und.join(da, "a").join(db, "b")
    a_first = F.struct("deg_a", "a") < F.struct("deg_b", "b")
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_hi"),
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(x, y, z): every triangle exactly once, corners sorted by id.

    Wedges form at each vertex over its OUT-neighbors ordered by the
    same (degree, id) key the orientation used — the closing edge
    between the two out-neighbors is then guaranteed to be oriented
    v -> w, so one equi-join finds it (no either-direction disjunct).
    """
    from lawlm_spark.operators.components import _lineage_cut

    # lineage-cut both shared relations (the graph-op policy): `und`
    # fans into the degree aggregate (twice) + the orientation join,
    # and `o` fans into both wedge sides + the closing edge — uncut,
    # Catalyst replicates the whole upstream pair pipeline into every
    # branch (30 FileScans in the r8 d51 audit; 2 after).  Edge-sized.
    reliable = edges.sparkSession.sparkContext.getCheckpointDir() is not None
    und = _lineage_cut(undirected_edges(edges, src, dst), reliable)
    o = _lineage_cut(oriented_edges(und), reliable)
    o1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("deg_hi").alias("dv"))
    o2 = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("deg_hi").alias("dw"))
    wedges = o1.join(o2, "u").filter(
        F.struct("dv", "v") < F.struct("dw", "w")
    )
    closing = o.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    return tri.select(
        F.least("u", "v", "w").alias("x"),
        F.greatest(
            F.least("u", "v"), F.least("v", "w"), F.least("u", "w")
        ).alias("y"),
        F.greatest("u", "v", "w").alias("z"),
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, n_triangles): per-node triangle participation — each
    triangle credits all three corners.  Exact integers, so the result
    hash-matches an id-ordered SQL replay even though the execution
    plan counts each triangle at a different (order-minimal) corner."""
    tri = triangles(edges, src, dst)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
