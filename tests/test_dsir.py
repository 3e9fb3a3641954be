"""DSIR importance-resampling tests (operators/dsir.py, r14).

Covers: the exact-zero identity when target == corpus (both models
coincide, so every log-ratio is 0.0 BIT-exactly); feature counting
(unigrams + adjacent bigrams, empty/one-token edges via the left
join); a pure-python replay of the whole model over a synthetic
corpus; directional sanity (target-vocabulary docs outscore
non-target docs); top-k selection with the (score desc, id asc)
tiebreak, keep_all, k > n, and validation; partitioning invariance;
the cache_registry contract; and the plan pins behind the scale
claims (ratio broadcasts into the scoring join, boundary row is
TakeOrderedAndProject — never a corpus-wide window sort).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.dsir import (
    dsir_importance,
    dsir_select,
    hashed_ngram_occurrences,
)

_ROWS = [
    (0, "aaa bbb aaa", "en"),
    (1, "aaa bbb", "en"),
    (2, "ccc ddd ccc ddd", "fr"),
    (3, "ccc", "fr"),
    (4, "aaa ccc bbb ddd", "de"),
    (5, "", "de"),
    (6, "eee", "de"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(
        rows or _ROWS, "doc_id long, text string, lang string"
    )


def _py_feats(text):
    tl = re.findall(r"[a-z0-9]+", text.lower())
    return tl + [f"{a}_{b}" for a, b in zip(tl, tl[1:])]


def _py_bucket(feat, num_buckets, salt):
    h = hashlib.md5(f"{salt}:{feat}".encode()).hexdigest()
    return int(h[:8], 16) % num_buckets


def _py_scores(rows, target_langs, num_buckets, salt):
    """Reference replay of the whole model: add-one-smoothed bucket
    multinomials, per-doc sum of occurrence log-ratios."""
    cr: Counter = Counter()
    ct: Counter = Counter()
    for _i, text, lang in rows:
        for f in _py_feats(text):
            b = _py_bucket(f, num_buckets, salt)
            cr[b] += 1
            if lang in target_langs:
                ct[b] += 1
    nr, nt = sum(cr.values()), sum(ct.values())
    out = {}
    for i, text, _lang in rows:
        fs = [_py_bucket(f, num_buckets, salt) for f in _py_feats(text)]
        s = sum(
            math.log((ct[b] + 1) / (nt + num_buckets))
            - math.log((cr[b] + 1) / (nr + num_buckets))
            for b in fs
        )
        out[i] = (len(fs), s)
    return out


def test_occurrences_unigrams_plus_bigrams(spark):
    occ = hashed_ngram_occurrences(_docs(spark), num_buckets=64, salt="t")
    per_doc = {
        r.doc_id: r.n
        for r in occ.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # "aaa bbb aaa" -> 3 unigrams + 2 bigrams; "ccc" -> 1; "" -> no rows
    assert per_doc[0] == 5
    assert per_doc[1] == 3
    assert per_doc[3] == 1
    assert 5 not in per_doc


def test_target_equals_corpus_scores_exactly_zero(spark):
    """ct == cr and nt == nr bucket-for-bucket, so each occurrence's
    log-ratio is ln(x) - ln(x): identical doubles, sum exactly 0.0."""
    scored = dsir_importance(_docs(spark), F.lit(True), num_buckets=64, salt="t")
    rows = scored.collect()
    assert len(rows) == len(_ROWS)
    assert all(r.lr_score == 0.0 for r in rows)


def test_scores_match_python_replay(spark):
    ref = _py_scores(_ROWS, {"en"}, 64, "t")
    got = dsir_importance(
        _docs(spark), F.col("lang") == "en", num_buckets=64, salt="t"
    ).collect()
    assert len(got) == len(ref)
    for r in got:
        n, s = ref[r.doc_id]
        assert r.n_feats == n
        assert r.lr_score == pytest.approx(s, abs=2e-6)


def test_target_vocab_docs_outscore_nontarget(spark):
    scored = {
        r.doc_id: r.lr_score
        for r in dsir_importance(
            _docs(spark), F.col("lang") == "en", num_buckets=64, salt="t"
        ).collect()
    }
    # doc 1 is pure target vocabulary, doc 2 pure non-target
    assert scored[1] > 0 > scored[2]
    # empty doc sits exactly at 0.0 via the left join
    assert scored[5] == 0.0


def test_dsir_randomized_vs_python_replay(spark):
    """Fixed-seed random trials (the test_properties_ops idiom): random
    corpora over a tiny vocabulary (forcing heavy bucket collisions at
    num_buckets=16) and random target slices; Spark must match the pure
    python replay score-for-score on every draw, including all-empty
    targets, duplicate texts, and zero-token docs."""
    import random

    rng = random.Random(1404)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(4):
        n = rng.randint(1, 60)
        rows = [
            (
                i,
                " ".join(rng.choices(vocab, k=rng.randint(0, 6))),
                rng.choice(["en", "fr"]),
            )
            for i in range(n)
        ]
        ref = _py_scores(rows, {"en"}, 16, "p")
        got = dsir_importance(
            _docs(spark, rows), F.col("lang") == "en", num_buckets=16, salt="p"
        ).collect()
        assert len(got) == n, f"row count diverged on trial {trial}"
        for r in got:
            n_feats, score = ref[r.doc_id]
            assert r.n_feats == n_feats, f"n_feats diverged on trial {trial}"
            assert r.lr_score == pytest.approx(score, abs=2e-6), (
                f"score diverged on trial {trial} doc {r.doc_id}"
            )


def test_select_topk_tiebreak_and_keep_all(spark):
    scored = spark.createDataFrame(
        [(10, 1, 2.0), (11, 1, 2.0), (12, 1, 2.0), (13, 1, 1.0)],
        "doc_id long, n_feats long, lr_score double",
    )
    reg: list = []
    sel = dsir_select(scored, k=2, cache_registry=reg).collect()
    # tie at the boundary resolves by doc_id asc
    assert sorted(r.doc_id for r in sel) == [10, 11]
    flagged = dsir_select(scored, k=2, keep_all=True).orderBy("doc_id").collect()
    assert [r.selected for r in flagged] == [True, True, False, False]
    # k > n keeps everything
    assert dsir_select(scored, k=99).count() == 4
    for df in reg:
        df.unpersist()
    assert len(reg) == 1


def test_validates_num_buckets(spark):
    with pytest.raises(ValueError, match="num_buckets must be"):
        dsir_importance(_docs(spark), F.lit(True), num_buckets=0)


def test_null_text_scores_like_empty(spark):
    """A NULL text drops at the explode (NULL token array) on both
    engines and comes back through the left join as (0, 0.0) — same
    contract as the empty string."""
    rows = [(0, "aa bb", "en"), (1, None, "fr"), (2, "", "fr")]
    got = {
        r.doc_id: (r.n_feats, r.lr_score)
        for r in dsir_importance(
            _docs(spark, rows), F.col("lang") == "en", num_buckets=16, salt="t"
        ).collect()
    }
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)
    assert got[0][0] == 3


def test_select_validates_k(spark):
    scored = spark.createDataFrame([(1, 1, 0.0)], "doc_id long, n_feats long, lr_score double")
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(scored, k=0)


def test_partitioning_invariance(spark):
    base = dsir_importance(
        _docs(spark), F.col("lang") == "en", num_buckets=64, salt="t"
    )
    shuffled = dsir_importance(
        _docs(spark).repartition(7), F.col("lang") == "en", num_buckets=64, salt="t"
    )
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, shuffled.collect()))
    assert a == b


def test_plan_shape(spark):
    """Scale pins: the bucket ratio BROADCASTS into the scoring join
    (bucket is never a corpus shuffle key), the selection boundary is
    TakeOrderedAndProject (no corpus-wide Window/global sort), and the
    only SinglePartition exchange sits above the bounded (<= B rows)
    checkpointed bucket table, never the document stream."""
    reg: list = []
    out = dsir_select(
        dsir_importance(_docs(spark), F.col("lang") == "en", num_buckets=64, salt="t"),
        k=2,
        keep_all=True,
        cache_registry=reg,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "hashpartitioning(bucket" not in plan  # ratio is broadcast, not shuffled
    for line in plan.splitlines():
        if "Exchange SinglePartition" in line:
            break
    else:
        pytest.fail("expected the bounded totals aggregate's SinglePartition")
    # the SinglePartition subtree reads the checkpointed bucket table,
    # not a FileScan of documents: no parquet scan below it
    below = plan.split("Exchange SinglePartition", 1)[1]
    first_scan = next(
        (ln for ln in below.splitlines() if "FileScan" in ln or "Scan ExistingRDD" in ln),
        "",
    )
    assert "FileScan" not in first_scan
    for df in reg:
        df.unpersist()
