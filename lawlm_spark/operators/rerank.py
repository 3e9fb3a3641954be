"""Pairwise (cross-encoder-style) re-ranking over a shortlist.

Completes the retrieval ladder the engine certifies end to end:
brute-force cosine → ANN (rp-LSH/IVF/PQ/SQ8) → late-interaction MaxSim
→ PAIRWISE re-rank, where a scorer sees the (query text, doc text)
PAIR jointly instead of comparing two independently-produced vectors.
The reference has no re-ranking tier at all — its answer quality is
whatever the single Qdrant hybrid query returns (app.py:139-173).

Architecture mirrors maxsim_rerank (operators/maxsim.py): the
shortlist is queries × stage-1 depth — tiny by construction — so it
BROADCASTS onto the corpus; the corpus meets only its shortlisted
rows via one BroadcastHashJoin on the doc key, the query table
broadcasts on the query key, and the only exchange after that is the
per-query top-k boundary (WindowGroupLimit).  At 100 TB the corpus is
never shuffled and never scored in full — stage 1 bounds the work to
O(|shortlist|).

Two scorer tiers (the embedding.py fake/real pattern, SURVEY §5.4):

* DEFAULT (deterministic, oracle-expressible): integer token-overlap
  relevance — score_micros = (1e6 · |Q ∩ D|) div |Q ∪ D| over the
  canonical-tokenizer term SETS of the pair.  Pure JVM set algebra
  (array_intersect/array_union on pre-deduped arrays), integer-exact,
  reproducible in ANSI SQL — so the whole re-rank tier is
  hash-certifiable against DuckDB.
* `scorer=` (the real cross-encoder path): any
  pandas-Series-pair → Series callable (e.g. a sentence-transformers
  CrossEncoder.predict wrapper) applied over Arrow batches of the
  joined pair stream — the model sees both texts, the plan shape is
  identical.  Scores are cast to long micros so ranking stays
  deterministic; ties still break by doc id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from lawlm_spark.functions.text import tokenize


def pairwise_rerank(
    shortlist: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    doc_text_col: str = "text",
    query_text_col: str = "question",
    k: int = 10,
    scorer: Callable | None = None,
) -> DataFrame:
    """(query_id, id, rerank_micros, rn): per-query top-k of the
    shortlist under the pairwise score.

    `shortlist` carries one row per candidate (query_id, id) — any
    certified stage-1 retriever produces it (v9 BM25 top-k, the
    d8/d8b/r4-r8 ANN paths, r11/r12 MaxSim).  `docs`/`queries` supply
    the texts; only shortlisted rows are ever fetched or scored.

    scorer=None uses the integer token-overlap relevance (see module
    docstring) — JVM-side, whole-stage-codegen, oracle-exact.  A
    callable scorer(q_texts: pd.Series, d_texts: pd.Series) ->
    pd.Series[float] runs as an Arrow-batched pandas UDF over the same
    joined pair stream (the cross-encoder hook); its float scores are
    quantized to long micros before ranking.
    """
    pairs = shortlist.select(query_id_col, id_col)
    pair_texts = (
        docs.select(id_col, F.col(doc_text_col).alias("_d_text"))
        .join(broadcast(pairs), id_col)
        .join(
            broadcast(
                queries.select(query_id_col, F.col(query_text_col).alias("_q_text"))
            ),
            query_id_col,
        )
    )
    if scorer is None:
        q = F.array_distinct(tokenize(F.col("_q_text")))
        d = F.array_distinct(tokenize(F.col("_d_text")))
        inter = F.size(F.array_intersect(q, d)).cast("long")
        union = F.size(F.array_union(q, d)).cast("long")
        score = F.expr(
            "(1000000 * _ov_inter) div greatest(_ov_union, 1L)"
        )
        scored = pair_texts.withColumns(
            {"_ov_inter": inter, "_ov_union": union}
        ).select(
            query_id_col, id_col, score.alias("rerank_micros")
        )
    else:
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _score(q_texts, d_texts):
            return scorer(q_texts, d_texts).astype("float64")

        # A non-finite score from the user scorer must fail loudly
        # BEFORE quantization (ADVICE r16, tightened by the r17
        # review): checked on the DOUBLE, because the long cast itself
        # is mode-dependent — ANSI (this runtime's default) throws a
        # raw CAST_OVERFLOW without actionable context, and non-ANSI
        # silently saturates (NaN -> 0 ranks mid-pack, +inf ->
        # Long.MAX ranks FIRST — the exact silent-misranking bug the
        # guard exists to prevent).
        _s = _score(F.col("_q_text"), F.col("_d_text"))
        _checked = F.when(
            F.isnan(_s) | (F.abs(_s) == float("inf")) | _s.isNull(),
            F.raise_error(
                F.lit(
                    "pairwise_rerank: scorer returned NaN/Inf/NULL "
                    "for a pair — fix the scorer or pre-filter its "
                    "inputs"
                )
            ).cast("double"),
        ).otherwise(_s)
        scored = pair_texts.select(
            query_id_col,
            id_col,
            F.round(_checked * 1_000_000).cast("long").alias("rerank_micros"),
        )
    from lawlm_spark.operators.ranking import top_k

    return top_k(
        scored,
        [query_id_col],
        F.col("rerank_micros").desc(),
        k,
        tiebreak=[id_col],
    )
