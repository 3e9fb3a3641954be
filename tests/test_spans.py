"""Duplicated-span detection/removal (operators/spans.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.spans import (
    dup_spans,
    duplicated_occurrences,
    positioned_shingles,
    remove_dup_spans,
)

SHARED = "alpha bravo charlie delta echo"  # 5 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1: shared run at tokens 3-7; doc 2: same run at 1-5; doc 3:
    # within-doc repeat of its own 5-token run; doc 4: clean.
    rows = [
        (1, "one two " + SHARED + " tail1 tail2"),
        (2, SHARED + " x y z w"),
        (3, "p q r s t p q r s t u v"),
        (4, "nothing shared here at all friend"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positioned_shingles_positions(spark, corpus):
    got = (
        positioned_shingles(corpus, n=3)
        .filter("doc_id = 2")
        .orderBy("pos")
        .collect()
    )
    assert got[0]["pos"] == 1 and got[0]["shingle"] == "alpha bravo charlie"
    assert got[-1]["pos"] == 7 and got[-1]["shingle"] == "y z w"


def test_keep_first_exempts_global_first(spark, corpus):
    # 3-shingles of SHARED appear in docs 1 and 2; global first is doc 1
    # (lowest doc_id), so only doc 2's copies are marked.
    occ = duplicated_occurrences(corpus, n=3).collect()
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    assert 1 not in by_doc  # doc 1 holds every kept first occurrence
    assert sorted(by_doc[2]) == [1, 2, 3]  # 3 windows of the 5-token run
    # second copy of its own run: windows "p q r","q r s","r s t" at 6-8
    assert sorted(by_doc[3]) == [6, 7, 8]


def test_dup_spans_merges_islands(spark, corpus):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): (
            r["span_tokens"],
            r["n_shingles"],
        )
        for r in dup_spans(corpus, n=3).collect()
    }
    # doc 2: windows at 1,2,3 with n=3 merge into tokens 1-5
    assert spans[(2, 1, 5)] == (5, 3)
    # doc 3: second 'p q r s t' = tokens 6-10 (3 merged windows)
    assert spans[(3, 6, 10)] == (5, 3)
    assert not any(d == 1 or d == 4 for d, _, _ in spans)


def test_remove_keeps_first_copy(spark, corpus):
    got = {r["doc_id"]: r["text"] for r in remove_dup_spans(corpus, n=3).collect()}
    assert got[1] == "one two " + SHARED + " tail1 tail2"  # first copy kept
    assert got[2] == "x y z w"
    assert got[3] == "p q r s t u v"
    assert got[4] == "nothing shared here at all friend"


def test_all_copies_mode(spark, corpus):
    occ = duplicated_occurrences(corpus, n=3, keep_first=False).collect()
    docs_hit = {r["doc_id"] for r in occ}
    assert docs_hit == {1, 2, 3}  # first occurrences marked too


def test_fully_duplicated_doc_comes_back_empty(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in remove_dup_spans(df, n=3).collect()}
    assert got == {1: "a b c d e", 2: ""}


def test_single_exchange_on_shingle_hash(spark, corpus):
    plan = duplicated_occurrences(corpus, n=3)._jdf.queryExecution().executedPlan().toString()
    # both windows share the md5 partitioning: exactly one hashpartitioning(_h...)
    assert plan.count("hashpartitioning(_h") == 1


def test_spans_match_python_reference_on_random_corpora(spark):
    """Differential test: 40 random small-vocab docs (duplicates are
    forced by the 6-token vocabulary) — spans AND rebuilt texts must
    equal a pure-Python reference of the same contract."""
    import random
    from collections import Counter, defaultdict

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e", "f"]
    n = 3
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randint(0, 15))] for d in range(40)
    }

    # pure-Python reference
    occ = []
    for d, toks in docs.items():
        for i in range(len(toks) - n + 1):
            occ.append((tuple(toks[i : i + n]), d, i + 1))
    cnt = Counter(sh for sh, _, _ in occ)
    by_sh = defaultdict(list)
    for sh, d, p in occ:
        by_sh[sh].append((d, p))
    per_doc = defaultdict(list)
    for sh, lst in by_sh.items():
        if cnt[sh] >= 2:
            for d, p in sorted(lst)[1:]:  # global first (doc, pos) exempt
                per_doc[d].append(p)
    want_spans, covered = set(), defaultdict(set)
    for d, ps in per_doc.items():
        ps.sort()
        islands, cur = [], [ps[0], ps[0]]
        for p in ps[1:]:
            if p - cur[1] > n:
                islands.append(tuple(cur))
                cur = [p, p]
            else:
                cur[1] = p
        islands.append(tuple(cur))
        for a, b in islands:
            hits = sum(1 for p in ps if a <= p <= b)
            want_spans.add((d, a, b + n - 1, b + n - 1 - a + 1, hits))
        for p in ps:
            covered[d].update(range(p, p + n))
    want_texts = {
        d: " ".join(t for i, t in enumerate(toks, start=1) if i not in covered[d])
        for d, toks in docs.items()
    }

    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()], "doc_id long, text string"
    )
    got_spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_shingles"])
        for r in dup_spans(df, n=n).collect()
    }
    assert got_spans == want_spans
    got_texts = {r["doc_id"]: r["text"] for r in remove_dup_spans(df, n=n).collect()}
    assert got_texts == want_texts
