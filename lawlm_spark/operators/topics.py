"""Cluster/stratum topic labeling via c-TF-IDF (Grootendorst's
BERTopic formulation): treat each cluster as ONE concatenated document
and rank the terms that are frequent inside it but rare across the
corpus — the "what is this cluster about" report a mix designer reads
next to the per-stratum corpus card (quality.corpus_report).

    score(t, c) = tf(t, c) * ln(1 + A / f_t)

with tf = term count inside the cluster, f_t = corpus-wide count, and
A = average token count per cluster.  Every input is an integer count
(the ln argument is a ratio of exact integers), so both engines produce
bit-identical doubles — full hash oracle.

Clusters are any label column: a language, a domain, or an
embedding-space cluster id (semdedup/sampling assignment) joined on
beforehand.  Scale: one explode + one (cluster, term)-keyed aggregate;
the corpus term table aggregates on the term key and joins back; the
top-k window partitions per cluster and WindowGroupLimit prunes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lawlm_spark.functions.text import tokenize


def ctfidf_top_terms(
    docs: DataFrame,
    cluster_col: str = "lang",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """(cluster, term, tf, score, rank): the k most distinctive terms
    per cluster, ties broken by term."""
    toks = docs.select(
        F.col(cluster_col).alias("cluster"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("cluster", "term").agg(F.count("*").alias("tf"))
    ft = toks.groupBy("term").agg(F.count("*").alias("f_t"))
    scal = (
        toks.groupBy().agg(F.count("*").alias("n_total"))
        .crossJoin(
            toks.select("cluster").distinct().groupBy().agg(
                F.count("*").alias("n_clusters")
            )
        )
    )
    scored = (
        tf.join(ft, "term")
        .crossJoin(F.broadcast(scal))
        .select(
            "cluster",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(
                    1 + (F.col("n_total") / F.col("n_clusters")) / F.col("f_t")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
