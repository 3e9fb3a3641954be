"""BM25 sparse featurization + scoring (O28/O30, SURVEY.md §2.4-2.5).

The reference delegates BM25 entirely to the Qdrant server
(models.Document(text, model="Qdrant/bm25"), data_extraction.py:300-303;
IDF modifier qdrant_manager.py:28-30).  This engine computes BM25
natively as relational algebra so it distributes:

  tokenize -> explode -> tf per (doc, term)        one shuffle on (doc,term)
  df per term -> idf                               aggregate on term
  weight = idf * tf(k1+1) / (tf + k1(1-b+b*dl/avgdl))

Scoring a query = semi-join of the posting table with the query terms
(small -> broadcast) + hash aggregate per doc.  At 100 TB the posting
table is the big fact; it is produced with a single explode+agg and the
per-term IDF side is tiny (vocabulary), so the join broadcasts.

k1=1.2, b=0.75 — the Qdrant/bm25 defaults (SURVEY.md O28).
IDF uses the BM25+ standard form ln((N - df + 0.5)/(df + 0.5) + 1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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


def idf_table(tf: DataFrame, id_col: str, n_docs_df: DataFrame) -> DataFrame:
    """(term, idf) — document frequency aggregate joined with corpus size.

    n_docs_df: single-row DataFrame with column `n_docs` (kept as a
    DataFrame so the whole plan stays lazy/declarative; it broadcasts).
    """
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    return df_counts.crossJoin(broadcast(n_docs_df)).select(
        "term",
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )


def bm25_index(docs: DataFrame, id_col: str, text_col: str, k1: float = K1, b: float = B) -> DataFrame:
    """Posting table (id, term, weight): the engine-native sparse vector.

    Equivalent to the reference's per-point sparse "bm25" named vector
    (qdrant_manager.py:27-31) but materialized relationally.
    """
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    avgdl = tf.select(id_col, "dl").distinct().agg(F.avg("dl").alias("avgdl"))
    idf = idf_table(tf, id_col, n_docs)
    return (
        tf.crossJoin(broadcast(avgdl))
        .join(broadcast(idf), "term")
        .select(
            id_col,
            "term",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("weight"),
        )
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
