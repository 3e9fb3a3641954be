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

# int64-safe ceiling for checked casts: comfortably inside Long.MAX so a
# checked value can still be summed a few times downstream without wrap.
_INT64_SAFE = 1 << 62


def _checked_long(col, what: str):
    """Check a DECIMAL-exact integer into int64 with a DESCRIPTIVE,
    mode-independent error (ADVICE r16, premise corrected by the r17
    review — this runtime defaults spark.sql.ansi.enabled=true):

    * ANSI on (the default here): plain long arithmetic would throw a
      raw ARITHMETIC_OVERFLOW with no context; this guard fires at
      2^62 — far below decimal's 38-digit ceiling — with the
      actionable "reduce weight_scale/k_fb/alpha_den" message.
    * ANSI off (a deployment that disables it): plain long arithmetic
      would WRAP SILENTLY and mis-rank while the DuckDB oracle errors;
      the decimal widening makes the product exact (two int64 always
      fit in 38 digits) and a decimal SUM overflowing 38 digits goes
      NULL, which falls into the raise branch below — still loud."""
    return (
        F.when(F.abs(col) <= F.lit(_INT64_SAFE), col.cast("long"))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"{what} exceeds the int64-safe bound 2^62 — reduce "
                    f"the scale parameters (weight_scale / k_fb / "
                    f"alpha_den / field weights)"
                )
            ).cast("long")
        )
    )


def _dec(col):
    """Widen to decimal(20,0) so every downstream product/sum runs in
    Spark's exact decimal arithmetic (precision-capped at 38 digits;
    past that: raw error under ANSI, NULL -> _checked_long's raise
    branch under non-ANSI — never a silent wrap in either mode)."""
    return col.cast("decimal(20,0)")


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


def rm3_expand_topk(
    index: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    text_col: str = "question",
    k_fb: int = 5,
    m_terms: int = 8,
    alpha_num: int = 5,
    alpha_den: int = 10,
    k: int = 10,
    weight_scale: int = 100,
) -> DataFrame:
    """BM25 pseudo-relevance feedback — RM3 query expansion (Abdul-Jaleel
    et al. 2004, "UMass at TREC 2004"; the Anserini/Lucene default PRF)
    re-expressed integer-exact so both engines rank identically.

    The reference's RAG quality depends entirely on raw query-term match
    (app.py:139-173 sends the user question verbatim); RM3 closes the
    vocabulary-mismatch gap: the top `k_fb` first-pass documents vote on
    `m_terms` expansion terms, and the final score interpolates the
    original query with the feedback relevance model at weight
    alpha = alpha_num/alpha_den.

    Integer-exact formulation (the maxsim/money house style — float
    sums diverge across engines by accumulation order, integers never):
    posting weights quantize to `weight_scale` units (centis by
    default), every multi-factor product/sum runs in exact decimal and
    is CHECKED back into int64 — an overflow raises a descriptive,
    ANSI-mode-independent error (ADVICE r16; see _checked_long) — and
    the per-query-positive constant alpha_den·|q|·fb_tot(q)
    multiplies through the textbook interpolation

        score'(q,d) = (1-a)·Σ_t qtf(t)/|q| · w(d,t)
                      + a·Σ_t fb(q,t)/fb_tot(q) · w(d,t)

    yielding the equivalent all-integer ranking score

        S(q,d) = (den-num)·fb_tot(q) · Σ_{t∈Q} qtf(t)·w(d,t)
               + num·|q| · Σ_{t∈E(q)} fb(q,t)·w(d,t)

    where fb(q,t) = Σ_{d∈topk_fb} w(d,t)·s1(q,d) is the score-weighted
    feedback term mass (RM1 with the doc prior ∝ first-pass score),
    fb_tot sums it over ALL feedback terms, and E(q) is the top
    `m_terms` feedback terms EXCLUDING the original query terms
    (deterministic tiebreak: term asc).  Per-query positive scaling
    preserves the interpolated ranking exactly.

    Scale shape: the query side (terms, feedback doc ids, expansion
    weights) is tiny at every stage and always broadcasts; the corpus
    posting table is scanned twice (first pass + expanded pass) and
    probed once on the doc key for feedback postings — three
    BroadcastHashJoins, each followed by one map-side-partial keyed
    aggregate, and two WindowGroupLimit top-k boundaries.  No
    corpus-keyed shuffle joins, no collects.

    Returns (query_id, id, rm3_score, rn) — rm3_score is the integer S.
    """
    if not 0 < alpha_num < alpha_den:
        raise ValueError(
            f"need 0 < alpha_num < alpha_den, got {alpha_num}/{alpha_den}"
        )
    from lawlm_spark.operators.ranking import top_k

    # Two-stage quantization: round(weight, 4) FIRST — the 4-dp posting
    # weight is the cross-engine-certified value (v9_bm25_index hash
    # matches it against DuckDB), so both engines hold the identical
    # double before the scale-and-round.  Quantizing the raw double
    # directly could straddle a .5 boundary on a 1-ulp ln() difference
    # between runtimes.
    idx = index.select(
        id_col, "term",
        F.round(F.round(F.col("weight"), 4) * weight_scale)
        .cast("long")
        .alias("_w"),
    )
    toks = queries.select(
        query_id_col, F.explode(tokenize(F.col(text_col))).alias("term")
    )
    qtf = toks.groupBy(query_id_col, "term").agg(F.count("*").alias("_qtf"))
    qlen = toks.groupBy(query_id_col).agg(F.count("*").alias("_qlen"))

    # first pass: integer BM25 score over the original terms.  Every
    # multi-factor product/sum from here down runs in exact decimal and
    # is checked back into int64 (_checked_long) — same values when in
    # range (the certified hashes hold), a loud error instead of a
    # silent wrap when a pathological weight_scale x doc-length x k_fb
    # combination would overflow (ADVICE r16).
    s1 = (
        idx.join(broadcast(qtf), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            _checked_long(
                F.sum(_dec(F.col("_w")) * F.col("_qtf")), "first-pass score"
            ).alias("_s1")
        )
    )
    fb_docs = top_k(
        s1, [query_id_col], F.col("_s1").desc(), k_fb, tiebreak=[id_col]
    ).select(query_id_col, id_col, "_s1")

    # relevance model: score-weighted term mass over the feedback docs
    fb = (
        idx.join(broadcast(fb_docs), id_col)
        .groupBy(query_id_col, "term")
        .agg(
            _checked_long(
                F.sum(_dec(F.col("_w")) * F.col("_s1")), "feedback term mass"
            ).alias("_fb")
        )
    )
    fb_tot = fb.groupBy(query_id_col).agg(
        F.greatest(
            _checked_long(F.sum(_dec(F.col("_fb"))), "feedback total"),
            F.lit(1).cast("long"),
        ).alias("_fb_tot")
    )
    exp_terms = top_k(
        fb.join(broadcast(qtf.select(query_id_col, "term")), [query_id_col, "term"], "left_anti"),
        [query_id_col],
        F.col("_fb").desc(),
        m_terms,
        tiebreak=["term"],
    )

    # expanded integer query: disjoint union of original + expansion terms
    # left join + coalesce(.,1): a query whose terms match NO documents
    # has no feedback mass — it degrades to pure first-pass scoring
    # instead of vanishing from the result
    orig_w = qtf.join(broadcast(fb_tot), query_id_col, "left").select(
        query_id_col, "term",
        _checked_long(
            F.lit(alpha_den - alpha_num)
            * _dec(F.coalesce(F.col("_fb_tot"), F.lit(1).cast("long")))
            * F.col("_qtf"),
            "original-term weight",
        ).alias("_qw"),
    )
    exp_w = exp_terms.join(broadcast(qlen), query_id_col).select(
        query_id_col, "term",
        _checked_long(
            F.lit(alpha_num) * _dec(F.col("_qlen")) * F.col("_fb"),
            "expansion-term weight",
        ).alias("_qw"),
    )
    qweights = orig_w.unionByName(exp_w)

    scored = (
        idx.join(broadcast(qweights), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            _checked_long(
                F.sum(_dec(F.col("_w")) * F.col("_qw")), "expanded score"
            ).alias("rm3_score")
        )
    )
    return top_k(
        scored, [query_id_col], F.col("rm3_score").desc(), k, tiebreak=[id_col]
    )


def sdm_bigram_topk(
    index: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    doc_text_col: str = "text",
    query_text_col: str = "question",
    k: int = 10,
    w_unigram: int = 8,
    w_bigram: int = 2000,
    weight_scale: int = 100,
) -> DataFrame:
    """Sequential-dependence proximity ranking (Metzler & Croft 2005,
    "A Markov Random Field Model for Term Dependencies", SIGIR) — the
    ordered-window feature pure bag-of-words BM25 cannot express: a
    document containing the exact phrase "table scan" outranks one
    containing "table" and "scan" ten paragraphs apart.

    Integer-exact two-feature instantiation (the full SDM's Dirichlet
    LM features are float-heavy; this keeps the MRF structure — term
    feature + ordered-bigram feature, linearly combined — with
    engine-portable arithmetic):

        S(q,d) = w_unigram · Σ_{t∈Q} qtf(t) · w_centis(d,t)
               + w_bigram  · Σ_{b∈B(q)} qbf(b) · tf_b(d,b)

    where w_centis quantizes the CERTIFIED 4-dp posting weight (the
    rm3_expand_topk rule), B(q) is the ordered adjacent-token bigram
    bag of the query, and tf_b counts exact adjacent occurrences in
    the document.  w_unigram/w_bigram are integer mixing weights; the
    defaults make one exact phrase hit worth roughly one strong
    unigram match on the synthetic corpus — tune per collection
    (Metzler-Croft's 0.85/0.10/0.05 split is the published prior; the
    unordered-window feature is omitted, documented).

    Scale shape: TWO contribution streams union into ONE keyed
    aggregate — the posting table meets broadcast(query terms), the
    doc bigram explode meets broadcast(query bigrams); both corpus
    branches are BroadcastHashJoins, the only exchanges are the final
    per-(query, doc) aggregate and the WindowGroupLimit top-k.  The
    bigram explode streams (no corpus-wide bigram index is
    materialized) and the join prefilters it to query bigrams only.
    """
    from lawlm_spark.functions.text import let_bound
    from lawlm_spark.operators.ranking import top_k

    idx = index.select(
        id_col, "term",
        F.round(F.round(F.col("weight"), 4) * weight_scale)
        .cast("long")
        .alias("_w"),
    )
    q_toks = queries.select(
        query_id_col, tokenize(F.col(query_text_col)).alias("_t")
    )
    qtf = q_toks.select(
        query_id_col, F.explode("_t").alias("term")
    ).groupBy(query_id_col, "term").agg(F.count("*").alias("_qtf"))

    def _bigrams(t):
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    qbf = q_toks.select(
        query_id_col, F.explode(_bigrams(F.col("_t"))).alias("bigram")
    ).groupBy(query_id_col, "bigram").agg(F.count("*").alias("_qbf"))

    contrib_u = idx.join(broadcast(qtf), "term").select(
        query_id_col, id_col,
        (F.lit(w_unigram) * F.col("_qtf") * F.col("_w")).alias("_c"),
    )
    doc_bigrams = docs.select(
        F.col(id_col),
        let_bound(tokenize(F.col(doc_text_col)), _bigrams).alias("_bg"),
    ).select(id_col, F.explode("_bg").alias("bigram"))
    contrib_b = doc_bigrams.join(broadcast(qbf), "bigram").select(
        query_id_col, id_col,
        (F.lit(w_bigram) * F.col("_qbf")).alias("_c"),
    )

    scored = (
        contrib_u.unionByName(contrib_b)
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_c").alias("sdm_score"))
    )
    return top_k(
        scored, [query_id_col], F.col("sdm_score").desc(), k, tiebreak=[id_col]
    )


def sdm_window_topk(
    index: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    doc_text_col: str = "text",
    query_text_col: str = "question",
    k: int = 10,
    w_unigram: int = 8,
    w_bigram: int = 2000,
    w_window: int = 500,
    window: int = 8,
    weight_scale: int = 100,
) -> DataFrame:
    """Full three-feature sequential-dependence ranking (Metzler &
    Croft 2005) — sdm_bigram_topk plus the UNORDERED-WINDOW
    co-occurrence feature the two-feature form documents as omitted
    (VERDICT r16 item 4a): adjacent query-term pairs that appear
    within `window` positions of each other in the document, in either
    order, score w_window per co-occurrence.

        S(q,d) = w_unigram · Σ_{t∈Q} qtf(t) · w_centis(d,t)
               + w_bigram  · Σ_{b∈B(q)} qbf(b) · tf_b(d,b)
               + w_window  · Σ_{{a,b}∈P(q)} qpf(a,b) · uw(d,a,b)

    where P(q) is the bag of UNORDERED adjacent query-term pairs
    (a = least, b = greatest; degenerate a == b pairs from repeated
    adjacent tokens are excluded) and uw counts position pairs
    (x ∈ pos(d,a), y ∈ pos(d,b)) with |x - y| <= window - 1 — the
    exact count the oracle's positional self-join produces.  The
    published prior weights term:ordered:unordered 0.85/0.10/0.05;
    the integer defaults keep that ordering at this corpus' count
    scales (tune per collection).

    Integer bounds: uw <= dl(a)·dl(b) so each contribution is
    <= w_window · qpf · dl² — far inside int64 for any real document;
    the term/bigram branches carry the sdm_bigram_topk bounds.

    Scale shape: THREE corpus branches union into ONE keyed aggregate.
    Term and bigram branches are sdm_bigram_topk's BroadcastHashJoins.
    The window branch posexplodes doc tokens, PREFILTERS to pair
    terms via a broadcast semi-join (the corpus-wide position table is
    never materialized beyond the query's own vocabulary), folds to a
    per-doc term->positions map (two keyed aggregates over that skinny
    prefiltered stream), and meets broadcast(P(q)) on the pair's first
    term — the partner term's positions come from the SAME row's map
    (element_at), so no positional self-join ever shuffles.  Per-pair
    counting is a JVM higher-order aggregate (no UDF).
    """
    from lawlm_spark.functions.text import let_bound
    from lawlm_spark.operators.ranking import top_k

    idx = index.select(
        id_col, "term",
        F.round(F.round(F.col("weight"), 4) * weight_scale)
        .cast("long")
        .alias("_w"),
    )
    q_toks = queries.select(
        query_id_col, tokenize(F.col(query_text_col)).alias("_t")
    )
    qtf = q_toks.select(
        query_id_col, F.explode("_t").alias("term")
    ).groupBy(query_id_col, "term").agg(F.count("*").alias("_qtf"))

    def _bigrams(t):
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    qbf = q_toks.select(
        query_id_col, F.explode(_bigrams(F.col("_t"))).alias("bigram")
    ).groupBy(query_id_col, "bigram").agg(F.count("*").alias("_qbf"))

    # unordered adjacent pairs, canonicalized a = least < b = greatest
    def _pairs(t):
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.least(
                        F.element_at(t, i), F.element_at(t, i + 1)
                    ).alias("a"),
                    F.greatest(
                        F.element_at(t, i), F.element_at(t, i + 1)
                    ).alias("b"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<a:string,b:string>>")
        )

    qpairs = (
        q_toks.select(query_id_col, F.explode(_pairs(F.col("_t"))).alias("_p"))
        .select(query_id_col, F.col("_p.a").alias("_a"), F.col("_p.b").alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .groupBy(query_id_col, "_a", "_b")
        .agg(F.count("*").alias("_qpf"))
    )
    pair_terms = (
        qpairs.select(F.col("_a").alias("term"))
        .unionByName(qpairs.select(F.col("_b").alias("term")))
        .distinct()
    )

    contrib_u = idx.join(broadcast(qtf), "term").select(
        query_id_col, id_col,
        (F.lit(w_unigram) * F.col("_qtf") * F.col("_w")).alias("_c"),
    )
    doc_bigrams = docs.select(
        F.col(id_col),
        let_bound(tokenize(F.col(doc_text_col)), _bigrams).alias("_bg"),
    ).select(id_col, F.explode("_bg").alias("bigram"))
    contrib_b = doc_bigrams.join(broadcast(qbf), "bigram").select(
        query_id_col, id_col,
        (F.lit(w_bigram) * F.col("_qbf")).alias("_c"),
    )

    # window branch: per-doc positions of pair terms only
    dpos = docs.select(
        F.col(id_col), F.posexplode(tokenize(F.col(doc_text_col)))
    ).select(
        id_col, (F.col("pos") + 1).alias("_p"), F.col("col").alias("term")
    ).join(broadcast(pair_terms), "term", "semi")
    docterm = dpos.groupBy(id_col, "term").agg(
        F.sort_array(F.collect_list("_p")).alias("_arr")
    )
    docmap = docterm.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("term", "_arr"))
        ).alias("_tmap")
    )
    expl = docmap.select(
        id_col, F.explode("_tmap").alias("term", "_arr_a"), "_tmap"
    )
    jw = expl.join(broadcast(qpairs), expl["term"] == qpairs["_a"])
    arr_b = F.coalesce(
        F.element_at(F.col("_tmap"), F.col("_b")),
        F.array().cast("array<long>"),
    )
    cnt = F.aggregate(
        F.col("_arr_a"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.size(
            F.filter(arr_b, lambda y: F.abs(y - x) <= F.lit(window - 1))
        ).cast("long"),
    )
    contrib_w = jw.select(
        query_id_col, id_col,
        (F.lit(w_window) * F.col("_qpf") * cnt).alias("_c"),
    ).filter(F.col("_c") > 0)

    scored = (
        contrib_u.unionByName(contrib_b)
        .unionByName(contrib_w)
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_c").alias("sdm_score"))
    )
    return top_k(
        scored, [query_id_col], F.col("sdm_score").desc(), k, tiebreak=[id_col]
    )


def bm25f_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    title_col: str,
    body_col: str,
    query_id_col: str,
    query_text_col: str,
    k1: float = K1,
    w_title: int = 2,
    w_body: int = 1,
    k: int = 10,
) -> DataFrame:
    """BM25F field-weighted ranking (Robertson & Zaragoza 2004, "Simple
    BM25 extension to multiple weighted fields" — VERDICT r17 item 4c):
    per-field length normalization folds BEFORE the tf saturation, so a
    term hit in a short weighted title field counts more than the same
    hit diluted in the body — the thing a weighted sum of per-field
    BM25 scores gets wrong (it saturates each field separately).

        tf~(t,d) = Σ_f w_f · tf_f(t,d) / B_f(d)
        B_f(d)   = 1 - b_f + b_f·len_f(d)/avglen_f
        score    = Σ_t idf(t) · tf~/(k1 + tf~)

    Integer-exact cross-engine arithmetic (the house rule): with
    b_f = 3/4 exactly, tf_f/B_f = 4·S_f·tf_f / (S_f + 3·len_f·N) where
    S_f = Σ_d len_f(d) and N = |docs| are exact int64 corpus stats —
    every numerator/denominator is an exact integer (decimal-widened,
    checked into int64), the two field ratios and the saturation are
    the SAME IEEE ops on identical doubles in both engines, and the
    per-term score is centi-quantized through the certified
    round(round(x, 4)·100) pattern so the final per-doc sum is an
    order-free int64.  idf is the BM25+ form over WHOLE-document df
    (a term's df counts a doc once whether it hits title, body, or
    both).

    Scale shape: one explode per field into a single keyed aggregate
    on (doc, term) (integer conditional sums — order-free), df as a
    window over the posting table (the bm25_index precedent: no
    re-explode), corpus stats a broadcast single row, query terms a
    broadcast join; ONE keyed aggregate per (query, doc) and a
    WindowGroupLimit top-k.  The corpus never joins a corpus-sized
    side.

    Returns (query_id, id, bm25f_cents, rn).
    """
    from lawlm_spark.operators.ranking import top_k

    fields = [("t", title_col, w_title), ("b", body_col, w_body)]
    tagged = None
    for tag, col, _w in fields:
        toks = docs.select(
            id_col, tokenize(F.col(col)).alias("_toks")
        ).select(
            id_col,
            F.explode("_toks").alias("term"),
            F.size("_toks").alias("_len"),
        )
        part = toks.groupBy(id_col, "term", "_len").agg(
            F.count("*").alias("_tf")
        ).select(
            id_col, "term", F.lit(tag).alias("_field"), "_tf", "_len"
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    posting = tagged.groupBy(id_col, "term").agg(
        F.sum(F.when(F.col("_field") == "t", F.col("_tf")).otherwise(0)).alias("_tf_t"),
        F.max(F.when(F.col("_field") == "t", F.col("_len"))).alias("_len_t"),
        F.sum(F.when(F.col("_field") == "b", F.col("_tf")).otherwise(0)).alias("_tf_b"),
        F.max(F.when(F.col("_field") == "b", F.col("_len"))).alias("_len_b"),
    )
    stats = docs.select(
        F.size(tokenize(F.col(title_col))).alias("_lt"),
        F.size(tokenize(F.col(body_col))).alias("_lb"),
    ).agg(
        _checked_long(F.sum(_dec(F.col("_lt"))), "bm25f title length total").alias("_S_t"),
        _checked_long(F.sum(_dec(F.col("_lb"))), "bm25f body length total").alias("_S_b"),
        F.count("*").alias("_N"),
    )
    q_terms = queries.select(
        query_id_col,
        F.explode(
            F.array_distinct(tokenize(F.col(query_text_col)))
        ).alias("term"),
    )
    df_per_term = F.count("*").over(Window.partitionBy("term"))
    hit = (
        posting.withColumn("_df", df_per_term)
        .join(broadcast(q_terms), "term")
        .crossJoin(broadcast(stats))
    )

    def ratio(tf_c, len_c, s_c, w: int):
        num = _checked_long(
            _dec(F.lit(4 * w)) * _dec(s_c) * _dec(tf_c),
            "bm25f field numerator",
        )
        den = _checked_long(
            _dec(s_c) + _dec(F.lit(3)) * _dec(F.coalesce(len_c, F.lit(0))) * _dec(F.col("_N")),
            "bm25f field denominator",
        )
        return F.when(tf_c > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))

    tfw = ratio(F.col("_tf_t"), F.col("_len_t"), F.col("_S_t"), w_title) + ratio(
        F.col("_tf_b"), F.col("_len_b"), F.col("_S_b"), w_body
    )
    nd = F.col("_N").cast("double")
    idf = F.log((nd - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0)
    cents = _checked_long(
        _dec(F.round(F.round(idf * tfw / (F.lit(k1) + tfw), 4) * 100)),
        "bm25f term weight",
    )
    scored = hit.select(query_id_col, id_col, cents.alias("_cents")).groupBy(
        query_id_col, id_col
    ).agg(F.sum("_cents").alias("bm25f_cents"))
    return top_k(
        scored, [query_id_col], F.col("bm25f_cents").desc(), k,
        tiebreak=[id_col],
    )
