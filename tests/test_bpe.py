"""operators/bpe.py: BPE training + distinct-word encoding."""

from __future__ import annotations

from lawlm_spark.operators.bpe import (
    EOW,
    apply_merges,
    bpe_token_counts,
    encode_words,
    train_bpe,
    word_counts,
)


def _counts_df(spark, pairs):
    return spark.createDataFrame(pairs, "word string, n long")


def test_classic_sennrich_example(spark):
    # the canonical corpus: low x5, lower x2, newest x6, widest x3.
    # 'es' wins first (9 = 6 newest + 3 widest), then 'est', 'est</w>'.
    counts = _counts_df(
        spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    )
    merges = train_bpe(counts, num_merges=4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    # rank-4 merge: 'l o' (7 = low 5 + lower 2) beats 'w i' (3) etc.
    assert merges[3] == ("l", "o")


def test_apply_merges_uses_rank_order_not_scan_order(spark):
    # merges: ('b','c') has LOWER rank than ('a','b').  In "abc" a
    # left-to-right greedy would fuse 'ab' first; BPE must fuse 'bc'.
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert apply_merges("abc", ranks) == ["a", "bc", EOW]


def test_encode_matches_training_segmentation(spark):
    counts = _counts_df(
        spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    )
    merges = train_bpe(counts, num_merges=10)
    words = spark.createDataFrame(
        [("newest",), ("lowest",), ("low",)], "word string"
    )
    got = {r["word"]: (r["bpe_tokens"], r["n_bpe"]) for r in encode_words(words, merges).collect()}
    # trained words compress well; 'lowest' (unseen) reuses 'lo'+'w'+'est</w>'
    assert got["newest"][1] < 7  # fewer tokens than characters+EOW
    assert got["lowest"][0][-1].endswith(EOW)
    ref = {w: apply_merges(w, {p: i for i, p in enumerate(merges)}) for w in got}
    for w, (toks, n) in got.items():
        assert toks == ref[w] and n == len(ref[w])


def test_token_counts_roundtrip_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, ""), (3, "newest newest")],
        "doc_id long, text string",
    )
    merges = train_bpe(word_counts(docs), num_merges=8)
    got = {r["doc_id"]: r for r in bpe_token_counts(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    want1 = sum(len(apply_merges(w, ranks)) for w in ["low", "lower", "newest"])
    assert got[1]["n_words"] == 3 and got[1]["n_bpe_tokens"] == want1
    assert got[2]["n_words"] == 0 and got[2]["n_bpe_tokens"] == 0
    assert got[3]["n_bpe_tokens"] == 2 * len(apply_merges("newest", ranks))


def test_differential_against_pure_python_on_testdata(spark, docs):
    """End-to-end: the distributed pipeline must agree exactly with a
    pure-Python BPE over the same corpus."""
    import re
    from collections import Counter

    sample = docs.select("doc_id", "text").filter("doc_id < 100")
    rows = sample.collect()
    # pure-Python replay: tokenize (same regex as functions/text.tokenize),
    # count, train, encode
    wc = Counter()
    doc_words = {}
    for r in rows:
        ws = re.findall(r"[a-z0-9]+", r["text"].lower())
        doc_words[r["doc_id"]] = ws
        wc.update(ws)
    vocab = {tuple(w) + (EOW,): n for w, n in wc.items()}
    merges = []
    for _ in range(50):
        pairs = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top)
        merges.append(best)
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab

    spark_merges = train_bpe(word_counts(sample), num_merges=50)
    assert spark_merges == merges

    ranks = {p: i for i, p in enumerate(merges)}
    want = {
        d: sum(len(apply_merges(w, ranks)) for w in ws)
        for d, ws in doc_words.items()
    }
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(sample, spark_merges).collect()
    }
    assert got == want


def test_merge_artifact_round_trip(spark, tmp_path):
    from lawlm_spark.operators.bpe import load_merges, save_merges

    counts = _counts_df(
        spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    )
    merges = train_bpe(counts, num_merges=10)
    path = str(tmp_path / "merges")
    save_merges(spark, merges, path)
    loaded = load_merges(spark, path)
    assert loaded == merges
    # encoding through the loaded artifact is identical
    docs = spark.createDataFrame([(1, "low lowest")], "doc_id long, text string")
    a = bpe_token_counts(docs, merges).collect()
    b = bpe_token_counts(docs, loaded).collect()
    assert a == b
