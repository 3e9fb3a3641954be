"""BM25 sparse featurization + scoring (O28/O30, SURVEY.md §2.4-2.5).

The reference delegates BM25 entirely to the Qdrant server
(models.Document(text, model="Qdrant/bm25"), data_extraction.py:300-303;
IDF modifier qdrant_manager.py:28-30).  This engine computes BM25
natively as relational algebra so it distributes:

  tokenize -> explode -> tf per (doc, term)   shuffle 1 on (doc, term)
  df per term via window over the postings    shuffle 2 on term
  weight = idf * tf(k1+1) / (tf + k1(1-b+b*dl/avgdl))

Corpus stats (n_docs, avgdl) come from a direct pass over the docs —
no explode, a single-row aggregate that broadcasts.  Spark does not
share subplans, so deriving df from a second aggregate over `tf` would
RE-EXECUTE the whole explode pipeline; the window form computes the
posting table exactly once (verified via .explain: one explode, two
exchanges total).

Scoring a query = semi-join of the posting table with the query terms
(small -> broadcast) + hash aggregate per doc.

k1=1.2, b=0.75 — the Qdrant/bm25 defaults (SURVEY.md O28).
IDF uses the BM25+ standard form ln((N - df + 0.5)/(df + 0.5) + 1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from lawlm_spark.functions.text import tokenize

K1 = 1.2
B = 0.75


def term_frequencies(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): token counts per document plus doc length."""
    toks = docs.select(id_col, tokenize(F.col(text_col)).alias("_toks")).select(
        id_col, F.explode("_toks").alias("term"), F.size("_toks").alias("dl")
    )
    return toks.groupBy(id_col, "term", "dl").agg(F.count("*").alias("tf"))


def corpus_stats(docs: DataFrame, text_col: str) -> DataFrame:
    """Single row (n_docs, avgdl) from one column-level pass (no explode);
    avgdl averages over docs with >= 1 token, matching the posting table."""
    dl = F.size(tokenize(F.col(text_col)))
    return docs.select(dl.alias("dl")).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
    )


def bm25_index(docs: DataFrame, id_col: str, text_col: str, k1: float = K1, b: float = B) -> DataFrame:
    """Posting table (id, term, weight): the engine-native sparse vector.

    Equivalent to the reference's per-point sparse "bm25" named vector
    (qdrant_manager.py:27-31) but materialized relationally.
    """
    tf = term_frequencies(docs, id_col, text_col)
    stats = corpus_stats(docs, text_col)
    df_per_term = F.count("*").over(Window.partitionBy("term"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    return (
        tf.crossJoin(broadcast(stats))
        .withColumn("df", df_per_term)
        .select(
            id_col,
            "term",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("weight"),
        )
    )


def postings_to_map(index: DataFrame, id_col: str) -> DataFrame:
    """Collapse the posting table to the SURVEY §1.3 index schema:
    (id, bm25 map<string,double>) — one row per document, the relational
    twin of Qdrant's named sparse vector.  map_from_entries over a
    deterministic sort keeps the map column reproducible."""
    return index.groupBy(id_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(F.col("term"), F.col("weight"))))
        ).alias("bm25")
    )


def bm25_score(index: DataFrame, id_col: str, query_terms: Sequence[str]) -> DataFrame:
    """Score every document against a bag of query terms: Σ weight.

    The term list is tiny -> IN-filter (pushes to the posting scan) +
    hash aggregate; no shuffle beyond the aggregate.
    """
    return (
        index.filter(F.col("term").isin(*[t.lower() for t in query_terms]))
        .groupBy(id_col)
        .agg(F.sum("weight").alias("bm25_score"))
    )


def bm25_score_queries(
    index: DataFrame, id_col: str, queries: DataFrame, query_id_col: str, text_col: str
) -> DataFrame:
    """Batch variant: score a whole DataFrame of queries (O30 at scale).

    queries (small) -> explode terms -> broadcast-join the posting table
    on term -> aggregate per (query, doc).
    """
    q_terms = queries.select(
        query_id_col, F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("term")
    )
    return (
        index.join(broadcast(q_terms), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.sum("weight").alias("bm25_score"))
    )
