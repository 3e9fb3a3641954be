"""Incremental near-dup (operators/dedup.py): new-batch-vs-indexed-corpus
LSH.  Cross-engine value parity is the d20 oracle's job; here we assert
the semantic contract (agreement with the full recompute) and the scale
plan shape (corpus index side never shuffles when the batch broadcasts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.dedup import (
    apply_incremental_near_dup,
    incremental_near_dup_pairs,
    minhash_dedup_pairs,
    near_dup_index,
)

CFG = dict(n=3, num_hashes=8, bands=4, min_jaccard=0.2)


def _neardup_corpus(docs):
    base = docs.filter("doc_id % 10 = 0").select("doc_id", "text")
    dups = docs.filter("doc_id % 20 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" padding tail extra")).alias("text"),
    )
    return base.unionByName(dups)


def _split(corpus):
    """Deterministic md5 split — old/new interleave in id order, so the
    corpus-flag branch and the within-batch branch both get exercised."""
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"
    return corpus.filter(~is_new), corpus.filter(is_new)


def test_incremental_matches_full_recompute(spark, docs):
    """A pair surfaced incrementally == the full-recompute pair set
    restricted to pairs involving >= 1 new doc (normalized order)."""
    corpus = _neardup_corpus(docs)
    old, new = _split(corpus)
    sh, bands = near_dup_index(old, "doc_id", "text", n=3, num_hashes=8, bands=4)
    inc = incremental_near_dup_pairs(new, sh, bands, "doc_id", "text", **CFG)
    inc_set = {
        (min(r["id_new"], r["id_matched"]), max(r["id_new"], r["id_matched"]), r["jaccard"])
        for r in inc.collect()
    }

    full = minhash_dedup_pairs(
        corpus, "doc_id", "text", n=3, num_hashes=8, bands=4, min_jaccard=0.2
    )
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    full_set = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in full.collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    assert len(inc_set) > 0
    assert inc_set == full_set


def test_incremental_direction_contract(spark, docs):
    """id_new is always from the batch; id_matched is a corpus doc (any
    id) or a smaller-id batch peer — never a larger batch peer."""
    corpus = _neardup_corpus(docs)
    old, new = _split(corpus)
    old_ids = {r["doc_id"] for r in old.select("doc_id").collect()}
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    sh, bands = near_dup_index(old, "doc_id", "text", n=3, num_hashes=8, bands=4)
    rows = incremental_near_dup_pairs(new, sh, bands, "doc_id", "text", **CFG).collect()
    assert all(r["id_new"] in new_ids for r in rows)
    for r in rows:
        assert r["id_matched"] in old_ids or (
            r["id_matched"] in new_ids and r["id_matched"] < r["id_new"]
        )


def test_apply_keeps_only_unmatched(spark, docs):
    corpus = _neardup_corpus(docs)
    old, new = _split(corpus)
    sh, bands = near_dup_index(old, "doc_id", "text", n=3, num_hashes=8, bands=4)
    pairs = incremental_near_dup_pairs(new, sh, bands, "doc_id", "text", **CFG)
    kept = apply_incremental_near_dup(new, pairs, "doc_id")
    dropped = {r["id_new"] for r in pairs.select("id_new").distinct().collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    all_new = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert kept_ids == all_new - dropped and dropped


def test_idempotent_after_apply(spark, docs):
    """Re-running the SURVIVORS against the same index matches nothing in
    the corpus direction twice... i.e. survivors re-checked only collide
    with themselves at jaccard 1.0 via the peer branch — which the
    smaller-id rule excludes, so a second pass drops nothing."""
    corpus = _neardup_corpus(docs)
    old, new = _split(corpus)
    sh, bands = near_dup_index(old, "doc_id", "text", n=3, num_hashes=8, bands=4)
    pairs = incremental_near_dup_pairs(new, sh, bands, "doc_id", "text", **CFG)
    kept = apply_incremental_near_dup(new, pairs, "doc_id")
    again = incremental_near_dup_pairs(kept, sh, bands, "doc_id", "text", **CFG)
    assert again.count() == 0


def test_broadcast_plan_no_corpus_shuffle(spark, docs):
    """With broadcast_new=True the candidate join must be a
    BroadcastHashJoin — the corpus index side streams with no Exchange
    between its scan and the join (the O(|new|) claim, in the plan)."""
    corpus = _neardup_corpus(docs)
    old, new = _split(corpus)
    sh, bands = near_dup_index(old, "doc_id", "text", n=3, num_hashes=8, bands=4)
    cand_plan = (
        incremental_near_dup_pairs(new, sh, bands, "doc_id", "text", **CFG)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in cand_plan
