"""IVF (inverted-file) approximate nearest neighbor (task brief: "an IVF
or LSH-bucketed variant as the scale path").

Classic two-stage ANN: KMeans partitions the corpus into nlist cells
(the "inverted file"); a query scores only the cells whose centroids are
nearest (nprobe of them).  Complements rp-LSH (similarity.py): IVF
adapts to the data distribution (learned centroids) where LSH is
data-oblivious; IVF recall/cost is tuned by nprobe at query time without
re-indexing.

Scale shape: training samples the corpus (KMeans on a bounded sample),
assignment is one scan + a broadcast of nlist centroids, and the query
join hits nprobe/nlist of the corpus — shuffle on cell id only.  The
centroid set is tiny and always broadcast.

Not oracle-checkable (KMeans float iterations aren't reproducible in
SQL); certified by tests against brute-force cosine instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from lawlm_spark.functions.vectors import cosine
from lawlm_spark.operators.ranking import top_k


def train_ivf_centroids(
    emb: DataFrame, vec_col: str, nlist: int = 16, seed: int = 42, sample_fraction: float = 1.0
) -> DataFrame:
    """(cell_id int, centroid array<double>): KMeans cells.

    At 100 TB pass sample_fraction << 1 — centroid quality needs a
    bounded sample, not the corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb if sample_fraction >= 1.0 else emb.sample(sample_fraction, seed=seed)
    ds = train.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=nlist, seed=seed, maxIter=20).fit(ds)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell_id int, centroid array<double>",
    )


def assign_cells(
    emb: DataFrame, id_col: str, vec_col: str, centroids: DataFrame
) -> DataFrame:
    """Corpus rows + their nearest-centroid cell_id (one scan, centroids
    broadcast, argmax via per-row top-1 window over the tiny cross)."""
    scored = emb.crossJoin(broadcast(centroids)).select(
        id_col,
        vec_col,
        "cell_id",
        cosine(F.col(vec_col), F.col("centroid")).alias("_cc"),
    )
    return top_k(scored, [id_col], F.col("_cc").desc(), 1, tiebreak=["cell_id"]).drop(
        "_cc", "rn"
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k over an IVF index (`indexed` = assign_cells output).

    Query side: rank cells by centroid cosine, keep nprobe; join the
    corpus on cell_id (probing nprobe/nlist of it); exact cosine re-rank.
    """
    q_cells = queries.crossJoin(broadcast(centroids)).select(
        query_id_col,
        query_vec_col,
        "cell_id",
        cosine(F.col(query_vec_col), F.col("centroid")).alias("_qc"),
    )
    probes = top_k(q_cells, [query_id_col], F.col("_qc").desc(), nprobe, tiebreak=["cell_id"]).select(
        query_id_col, query_vec_col, "cell_id"
    )
    scored = indexed.join(broadcast(probes), "cell_id").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    )
    return top_k(scored, [query_id_col], F.col("cos").desc(), k, tiebreak=[id_col])
