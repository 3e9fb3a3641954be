"""operators/quality.py: repetition metrics, eval-set decontamination,
per-domain caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.quality import (
    cap_per_domain,
    contamination_hits,
    decontaminate,
    repetition_metrics,
)


def test_repetition_metrics_hand_case(spark):
    rows = [
        # 4 non-empty lines, 2 distinct -> dup_line_frac 0.5; tokens
        # a b a b c d c d -> 7 bigrams, 'a b' and 'c d' twice -> top 2/7
        (1, "a b\na b\n\nc d\nc d"),
        (2, "unique one\nunique two"),  # no dup lines, all bigrams distinct
        (3, ""),  # no lines, no bigrams
        (4, "solo"),  # 1 line, 1 token -> no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert out[1]["n_lines"] == 4 and out[1]["dup_line_frac"] == 0.5
    assert out[1]["top_bigram_frac"] == round(2 / 7, 6)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[3]["n_lines"] == 0 and out[3]["dup_line_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[4]["top_bigram_frac"] == 0.0


def test_contamination_and_decontaminate(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words entirely here today friends"),
            (3, "prefix text then the quick brown fox jumps too"),
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    hits = {r["doc_id"]: r["n_hit_shingles"] for r in
            contamination_hits(train, eval_docs, n=5).collect()}
    assert 1 in hits and 3 in hits  # both contain the eval 5-gram
    assert 2 not in hits
    kept = {r["doc_id"] for r in decontaminate(train, eval_docs, n=5).collect()}
    assert kept == {2}


def test_cap_per_domain(spark, docs):
    capped = cap_per_domain(docs, "source", k=7)
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 7 for r in per)
    # deterministic: the kept ids are the 7 smallest per source
    lowest = {
        (r["source"], r["doc_id"])
        for r in docs.selectExpr(
            "source", "doc_id",
            "row_number() over (partition by source order by doc_id) rn",
        ).filter("rn <= 7").collect()
    }
    got = {(r["source"], r["doc_id"]) for r in capped.select("source", "doc_id").collect()}
    assert got == lowest


def test_quality_prune_per_stratum(spark):
    from lawlm_spark.operators.quality import quality_prune

    rows = [(i, "a", float(i)) for i in range(10)] + [(100 + i, "b", 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
    kept = quality_prune(df, "lang", "quality", keep_frac=0.5).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # stratum a: quality == doc_id desc -> ranks k/9; <= 0.5 keeps k <= 4
    assert by_lang["a"] == {9, 8, 7, 6, 5}
    # stratum b: all tied -> id tiebreak; ranks 0, 1/3, 2/3, 1 -> keep 2 lowest
    assert by_lang["b"] == {100, 101}


def test_corpus_report_shape(spark):
    from lawlm_spark.operators.quality import corpus_report

    df = spark.createDataFrame(
        [(1, "en", "one two three"), (2, "en", "four five"), (3, "de", "sechs")],
        "doc_id long, lang string, text string",
    )
    out = {r["stratum"]: r for r in corpus_report(df, "lang", "text").collect()}
    assert out["en"]["n_docs"] == 2 and out["en"]["total_tokens"] == 5
    assert out["en"]["median_chars"] == (13 + 9) / 2
    assert out["de"]["n_docs"] == 1 and out["de"]["total_tokens"] == 1


def test_cap_per_domain_plan_has_window_group_limit(spark, docs):
    plan = cap_per_domain(docs, "source", k=7)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_decontamination_broadcasts_eval_side(spark, docs):
    eval_docs = docs.filter("doc_id % 17 = 0")
    plan = (
        contamination_hits(docs, eval_docs, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # eval shingles broadcast, corpus streams


def test_unigram_nll_model_math(spark):
    import math

    from lawlm_spark.operators.quality import unigram_nll

    # corpus: "a a a b" + empty doc.  N=4 tokens, V=2 vocab, denom=7.
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b"), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_nll(df, vocab_size=10).collect()}
    nll_a = -math.log((3 + 1) / 7)
    nll_b = -math.log((1 + 1) / 7)
    assert got[1]["n_tokens"] == 3 and abs(got[1]["avg_nll"] - round(nll_a, 6)) < 1e-9
    assert got[2]["n_tokens"] == 1 and abs(got[2]["avg_nll"] - round(nll_b, 6)) < 1e-9
    assert got[3]["n_tokens"] == 0 and got[3]["avg_nll"] == 0.0


def test_unigram_nll_oov_and_vocab_cap(spark):
    import math

    from lawlm_spark.operators.quality import unigram_nll

    # vocab_size=1 keeps only 'a' (count 3 beats 1); 'z' is OOV.
    # N=4, V=1, denom=6: p(a)=(3+1)/6, p(z)=1/6.
    df = spark.createDataFrame([(1, "a a a z")], "doc_id long, text string")
    got = unigram_nll(df, vocab_size=1).collect()[0]
    want = (3 * -math.log(4 / 6) + -math.log(1 / 6)) / 4
    assert got["n_tokens"] == 4 and abs(got["avg_nll"] - round(want, 6)) < 1e-9


def test_unigram_nll_vocab_is_take_ordered(spark, docs):
    from lawlm_spark.operators.quality import unigram_nll

    plan = unigram_nll(docs, vocab_size=100)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-V without a 1-partition sort


def test_bigram_nll_model_math(spark):
    import math

    from lawlm_spark.operators.quality import bigram_nll

    # corpus: doc1 "a b a", doc2 "b b", doc3 "a", doc4 "".
    # mapped stream (vocab covers all): tokens a,b,a / b,b / a -> N=6.
    # V' = 2 classes (no OOV).  uni: c(a)=3, c(b)=3.
    # bigrams: doc1 (a,b),(b,a); doc2 (b,b).  c_bi: ab=1, ba=1, bb=1.
    # c_ctx: a->1 (a followed once), b->2.
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b b"), (3, "a"), (4, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_nll(df, vocab_size=10).collect()}

    def p(c_bi, c_ctx, c_uni, v=2, n=6):
        return ((c_bi + 1) / (c_ctx + v + 1) + (c_uni + 1) / (n + v + 1)) / 2

    want1 = (-math.log(p(1, 1, 3)) - math.log(p(1, 2, 3))) / 2  # (a,b), (b,a)
    want2 = -math.log(p(1, 2, 3))  # (b,b)
    assert got[1]["n_bigrams"] == 2 and abs(got[1]["avg_nll"] - round(want1, 6)) < 1e-9
    assert got[2]["n_bigrams"] == 1 and abs(got[2]["avg_nll"] - round(want2, 6)) < 1e-9
    assert got[3]["n_bigrams"] == 0 and got[3]["avg_nll"] == 0.0
    assert got[4]["n_bigrams"] == 0 and got[4]["avg_nll"] == 0.0


def test_bigram_nll_oov_collapses_to_unk(spark):
    import math

    from lawlm_spark.operators.quality import bigram_nll

    # vocab_size=1 keeps only 'a' (3 > 1 each); x and y both map to
    # <unk>, so the bigram (x,y) and (y,a) score as (<unk>,<unk>) and
    # (<unk>,a) — OOV bigrams share mass instead of each being novel.
    # mapped: a,a,a,u,u,a -> N=6, classes {a,<unk>} -> V'=2.
    # uni: a=4, u=2.  bigrams: (a,a)x2,(a,u),(u,u),(u,a).
    # c_ctx: a->3, u->2.
    df = spark.createDataFrame([(1, "a a a x y a")], "doc_id long, text string")
    got = bigram_nll(df, vocab_size=1).collect()[0]

    def p(c_bi, c_ctx, c_uni, v=2, n=6):
        return ((c_bi + 1) / (c_ctx + v + 1) + (c_uni + 1) / (n + v + 1)) / 2

    want = (
        -2 * math.log(p(2, 3, 4))  # (a,a) twice
        - math.log(p(1, 3, 2))  # (a,<unk>)
        - math.log(p(1, 2, 2))  # (<unk>,<unk>)
        - math.log(p(1, 2, 4))  # (<unk>,a)
    ) / 5
    assert got["n_bigrams"] == 5 and abs(got["avg_nll"] - round(want, 6)) < 1e-9


def test_bigram_nll_repetitive_text_scores_lower(spark, docs):
    from lawlm_spark.operators.quality import bigram_nll
    from pyspark.sql import functions as F

    corpus = docs.select("doc_id", "text").unionByName(
        docs.sparkSession.createDataFrame(
            [(990001, "the court held that " * 50)], "doc_id long, text string"
        )
    )
    out = bigram_nll(corpus, vocab_size=500)
    rep = out.filter("doc_id = 990001").first()["avg_nll"]
    mean = out.filter("doc_id < 990001 and n_bigrams > 0").agg(
        F.avg("avg_nll")
    ).first()[0]
    assert rep < mean  # a fixed loop of in-vocab bigrams is maximally predictable


def test_ngram_novelty_hand_case(spark):
    from lawlm_spark.operators.quality import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),        # shingles: abc, bcd
            (2, "a b c e"),        # shingles: abc, bce -> shares abc with 1
            (3, "x y z w"),        # fully unique
            (4, ""),               # no shingles
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert got[1]["n_shingles"] == 2 and got[1]["n_novel"] == 1
    assert got[1]["novelty"] == 0.5
    assert got[2]["novelty"] == 0.5
    assert got[3]["novelty"] == 1.0
    assert got[4] and got[4]["n_shingles"] == 0 and got[4]["novelty"] == 0.0


def test_ngram_novelty_exact_copies_score_zero(spark, docs):
    from pyspark.sql import functions as F

    from lawlm_spark.operators.quality import ngram_novelty

    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter("doc_id % 5 = 0").select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text"
        )
    )
    out = ngram_novelty(corpus, n=3)
    copies = out.filter("doc_id >= 500000 and n_shingles > 0")
    assert copies.filter("novelty > 0").count() == 0  # every shingle shared


def test_gopher_rules_each_gate(spark):
    """One crafted document per failing rule; a clean doc passes."""
    from lawlm_spark.operators.quality import gopher_rules

    good = ("The quick brown fox jumps over the lazy dog and runs on. " * 6).strip()
    docs = spark.createDataFrame(
        [
            (1, good),                                       # passes
            (2, "too short of a text"),                      # n_words < 50
            (3, ("a " * 80).strip()),                        # mean word len < 3
            (4, good + " " + "#" * 40),                      # symbol ratio
            (5, "\n".join(["- item in the list of the day"] * 60)),  # bullets
            (6, "\n".join([f"{good} trailing off..."] * 10)),  # ellipsis lines
            (7, ("123 456 " * 40 + "the is").strip()),       # alpha ratio
            (8, ("wordlike " * 60).strip()),                  # no stopwords
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert got[1]["gopher_pass"] is True
    for d in range(2, 9):
        assert got[d]["gopher_pass"] is False, f"doc {d} should fail"
    assert got[2]["n_words"] < 50
    assert got[3]["mean_word_len"] < 3.0
    assert got[4]["symbol_ratio"] >= 0.1
    assert got[5]["bullet_line_ratio"] >= 0.9
    assert got[6]["ellipsis_line_ratio"] >= 0.3
    assert got[7]["alpha_word_ratio"] < 0.8
    assert got[8]["stopword_hits"] < 2


def test_check_expectations_counts_and_null_strictness(spark):
    from lawlm_spark.operators.quality import check_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 200.0)], "id long, v double"
    )
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["violation_rate"])
        for r in check_expectations(
            df, [("positive", "v > 0"), ("bounded", "v < 100")]
        ).collect()
    }
    # NULL predicate counts as a violation (strict)
    assert got["positive"] == (4, 2, 0.5)   # -5 and NULL
    assert got["bounded"] == (4, 2, 0.5)    # 200 and NULL


def test_check_expectations_single_scan_plan(spark, events):
    from lawlm_spark.operators.quality import check_expectations

    plan = (
        check_expectations(events, [("a", "value > 0"), ("b", "user_id > 0")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one aggregate over one scan feeds every rule: a single FileScan
    assert plan.count("FileScan") == 1


def test_zscore_outliers_flags_planted_extreme(spark):
    from pyspark.sql import functions as F
    from lawlm_spark.operators.quality import zscore_outliers

    rows = [(i, "g", 100 + (i % 7)) for i in range(200)] + [(999, "g", 90000)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = zscore_outliers(df, "g", F.col("v"), "id")
    flagged = [r["id"] for r in out.filter("is_outlier").collect()]
    assert flagged == [999]
    # z of the planted point is enormous; the bulk is near zero
    z999 = out.filter("id = 999").first()["z"]
    assert z999 > 10


def test_dataset_card_consistency(spark, docs):
    """Card totals must reconcile with the underlying operators."""
    from pyspark.sql import functions as F
    from lawlm_spark.operators.quality import dataset_card, gopher_rules
    from lawlm_spark.operators.dedup import dedup_exact

    card = {r["lang"]: r for r in dataset_card(docs).collect()}
    assert sum(r["n_docs"] for r in card.values()) == docs.count()
    # dup accounting: n_dup_docs across langs == docs removed by exact dedup,
    # when no duplicate pair straddles languages (true for this corpus)
    n_removed = docs.count() - dedup_exact(docs, "doc_id", "text").count()
    assert sum(r["n_dup_docs"] for r in card.values()) == n_removed
    # pass-rate accounting
    g = gopher_rules(docs)
    for lang, row in card.items():
        n = g.filter(F.col("lang") == lang).count()
        p = g.filter((F.col("lang") == lang) & F.col("gopher_pass")).count()
        assert abs(row["pct_gopher_pass"] - p / n) < 1e-6
