"""Winnowing fingerprints (operators/fingerprint.py): exact
differential vs a pure-Python reference implementation of Schleimer et
al. 2003, plus the paper's two core properties (density, shared-
substring guarantee) and the operator-family invariants (partitioning
independence, hot-fingerprint cap)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.fingerprint import (
    _B,
    kgram_hashes,
    winnow_fingerprints,
    winnow_pairs,
)

K, W = 8, 6


def _h32(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _ref_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Pure-Python reference: {(pos, hash)} selected by winnowing with
    rightmost-min tie-break, INCLUDING the partial windows at the doc
    start (the module's documented deviation)."""
    n = max(len(text) - k + 1, 1)
    hashes = [_h32(text[i : i + k]) for i in range(n)]
    out: set[tuple[int, int]] = set()
    for e in range(n):  # window of ends: positions [e-w+1 .. e]
        lo = max(e - w + 1, 0)
        best = min(range(lo, e + 1), key=lambda i: (hashes[i], -i))
        out.add((best + 1, hashes[best]))  # 1-based pos
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(74)
    alphabet = "abcdef gh"
    base = "".join(rng.choice(alphabet) for _ in range(220))
    rows = [
        (1, base),
        (2, base[:100] + "XYZQRST" + base[100:]),  # near-dup of 1
        (3, "".join(rng.choice(alphabet) for _ in range(180))),
        (4, "tiny"),  # shorter than k
        (5, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # all grams identical (ties)
        (6, ""),  # empty text
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_differential_vs_pure_python(spark, corpus):
    got = {
        (r["id"], r["pos"], r["fhash"])
        for r in winnow_fingerprints(corpus, "doc_id", "text", K, W).collect()
    }
    want = set()
    for r in corpus.collect():
        for pos, h in _ref_winnow(r["text"]):
            want.add((r["doc_id"], pos, h))
    assert got == want


def test_every_doc_fingerprinted(spark, corpus):
    ids = {
        r["id"]
        for r in winnow_fingerprints(corpus, "doc_id", "text", K, W)
        .select("id")
        .distinct()
        .collect()
    }
    assert ids == {1, 2, 3, 4, 5, 6}  # short/empty docs still own one


def test_tie_break_rightmost(spark, corpus):
    # doc 5 is a run of 'a': every gram hashes identically, so each
    # window's min must be its RIGHTMOST position — selections are all
    # positions (each window end e selects e itself).
    got = sorted(
        r["pos"]
        for r in winnow_fingerprints(corpus, "doc_id", "text", K, W)
        .filter("id = 5")
        .collect()
    )
    n = 24 - K + 1
    assert got == list(range(1, n + 1))


def test_density_near_two_over_w_plus_one(spark):
    rng = random.Random(7)
    text = "".join(rng.choice("abcdefghij klmno") for _ in range(5000))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_sel = winnow_fingerprints(df, "doc_id", "text", K, W).count()
    n_pos = len(text) - K + 1
    density = n_sel / n_pos
    assert 0.22 <= density <= 0.35  # E = 2/(w+1) = 0.286


def test_shared_substring_guarantee(spark):
    # Any shared substring of length >= w + k - 1 guarantees >= 1
    # shared selected fingerprint (the winnowing correctness theorem).
    rng = random.Random(99)
    shared = "".join(rng.choice("abcdefgh") for _ in range(W + K - 1))
    rows = []
    for i in range(1, 21):
        pre = "".join(rng.choice("qrstuvwx") for _ in range(rng.randint(0, 60)))
        suf = "".join(rng.choice("qrstuvwx") for _ in range(rng.randint(0, 60)))
        rows.append((i, pre + shared + suf))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, "doc_id", "text", K, W).select("id", "fhash")
    shared_hashes = {_h32(shared[i : i + K]) for i in range(len(shared) - K + 1)}
    per_doc = {
        r["id"]: r["n"]
        for r in fp.filter(F.col("fhash").isin(list(shared_hashes)))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per_doc) == set(range(1, 21))  # every doc selected >= 1


def test_pairs_rank_near_dups_first(spark, corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared"]
        for r in winnow_pairs(corpus, "doc_id", "text", K, W).collect()
    }
    assert (1, 2) in pairs
    top = max(pairs, key=lambda p: pairs[p])
    assert top == (1, 2)  # the planted near-dup dominates


def test_doc_freq_cap_drops_boilerplate(spark):
    boiler = "this boilerplate header appears everywhere "
    rows = [(i, boiler + f"unique tail {i} " * 3) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap below the corpus size: boilerplate fingerprints (present in
    # all 10 docs) are dropped, so no pair survives on them alone
    pairs = winnow_pairs(df, "doc_id", "text", K, W, max_doc_freq=5)
    assert pairs.count() == 0
    # with the cap relaxed the same corpus pairs up fully
    assert winnow_pairs(df, "doc_id", "text", K, W, max_doc_freq=50).count() == 45


def test_partitioning_invariance(spark, corpus):
    one = {
        tuple(r)
        for r in winnow_fingerprints(
            corpus.repartition(1), "doc_id", "text", K, W
        ).collect()
    }
    many = {
        tuple(r)
        for r in winnow_fingerprints(
            corpus.repartition(7), "doc_id", "text", K, W
        ).collect()
    }
    assert one == many


def test_packed_key_decodes_exactly(spark, corpus):
    # key = h * B + (B-1-p) must round-trip (h, p) for every position
    got = kgram_hashes(corpus, "doc_id", "text", K).collect()
    for r in got:
        h, p = divmod(r["key"], _B)
        assert _B - 1 - p == r["p"]
        assert 0 <= h < 1 << 32


def test_position_past_packing_bound_fails_loudly(spark):
    """A position past 2^24-1 must raise (the guard in _packed_key),
    never underflow into a neighboring hash's fingerprint bucket.
    Driven through the helper so the test doesn't need a 16.7M-char
    document to reach the bound."""
    from lawlm_spark.operators.fingerprint import _packed_key

    df = spark.createDataFrame([(1, _B - 1), (2, _B)], "h long, p long")
    ok = df.filter(F.col("p") < _B).select(
        _packed_key(F.col("h"), F.col("p")).alias("key")
    )
    assert ok.collect()[0]["key"] == 1 * _B + 0  # h=1, p=B-1 packs exactly
    bad = df.select(_packed_key(F.col("h"), F.col("p")).alias("key"))
    with pytest.raises(Exception, match="exceeds"):
        bad.collect()
