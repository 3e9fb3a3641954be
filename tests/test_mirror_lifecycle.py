"""Mirror small-file compaction (sources/mirror.py::compact_mirror) and
the LSH hot-bucket guard (operators/dedup.py::cap_band_buckets)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from lawlm_spark.operators.dedup import (
    band_bucket_sizes,
    band_table,
    cap_band_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
)
from lawlm_spark.sources.mirror import (
    compact_mirror,
    mirror_file_stats,
    scan_mirror,
    write_mirror,
)


def test_compact_mirror_merges_small_files(spark, docs):
    path = tempfile.mkdtemp(prefix="compact_") + "/mirror"
    # simulate streaming ingest: many tiny per-micro-batch file sets
    for i in range(6):
        write_mirror(docs.filter(F.col("doc_id") % 6 == i).repartition(4), path, mode="append")
    n_before, bytes_before = mirror_file_stats(path)
    assert n_before >= 20
    before = sorted(r["doc_id"] for r in scan_mirror(spark, path).collect())

    n_after = compact_mirror(spark, path)  # default target >> total -> 1 file
    assert n_after == 1
    assert mirror_file_stats(path)[0] == 1
    after = sorted(r["doc_id"] for r in scan_mirror(spark, path).collect())
    assert after == before  # row identity, nothing lost or duplicated


def test_compact_mirror_respects_target(spark, docs):
    path = tempfile.mkdtemp(prefix="compact_") + "/mirror"
    write_mirror(docs.repartition(16), path)
    _, total = mirror_file_stats(path)
    # target = ~quarter of the data -> ceil(total/target) = 4 files
    n_after = compact_mirror(spark, path, target_bytes=max(1, total // 4 + 1))
    assert 2 <= n_after <= 5
    assert scan_mirror(spark, path).count() == docs.count()


def _degenerate_corpus(spark):
    """30 identical tiny docs (one degenerate band bucket in every band)
    plus one genuine near-dup pair with distinctive text."""
    boiler = [(i, "standard boilerplate notice apply today") for i in range(30)]
    pair = [
        (100, "the quick brown fox jumps over the lazy dog near the river bank"),
        (101, "the quick brown fox jumps over the lazy dog near the river bend"),
    ]
    return spark.createDataFrame(boiler + pair, "doc_id long, text string")


def test_cap_band_buckets_drops_hot_keys_only(spark):
    docs = _degenerate_corpus(spark)
    sig = minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=8)
    rows = band_table(sig, "doc_id", 8, 4)
    sizes = {(r["band"], r["band_key"]): r["n"] for r in band_bucket_sizes(rows).collect()}
    assert max(sizes.values()) == 30  # the degenerate bucket exists
    capped = cap_band_buckets(rows, 10)
    left = {(r["band"], r["band_key"]) for r in capped.select("band", "band_key").collect()}
    assert all(sizes[k] <= 10 for k in left)
    assert any(sizes[k] > 10 for k in sizes)  # something was actually dropped


def test_capped_pairs_keep_real_dups(spark):
    docs = _degenerate_corpus(spark)
    capped = lsh_candidate_pairs(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=4, max_band_bucket=10
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert (100, 101) in pairs  # the genuine near-dup survives the cap
    assert all(not (a < 30 and b < 30) for a, b in pairs)  # boiler 435-pair blowup gone
    # uncapped: the degenerate bucket contributes all C(30,2) pairs
    full = lsh_candidate_pairs(docs, "doc_id", "text", n=3, num_hashes=8, bands=4)
    assert full.count() == len(pairs) + 435


def test_cap_none_identical(spark, docs):
    sub = docs.filter("doc_id % 10 = 0")
    a = lsh_candidate_pairs(sub, "doc_id", "text", n=3, num_hashes=8, bands=4)
    b = lsh_candidate_pairs(
        sub, "doc_id", "text", n=3, num_hashes=8, bands=4, max_band_bucket=10**9
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_partitioned_mirror_prunes_at_plan_time(spark, docs, tmp_path):
    from lawlm_spark.sources.mirror import scan_mirror_pruned, write_mirror_partitioned

    path = str(tmp_path / "part_mirror")
    write_mirror_partitioned(docs, path, ["lang", "source"])

    pruned = scan_mirror_pruned(spark, path, lang="en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the filter reached the scan as a PARTITION filter (planning-time
    # directory pruning), and no residual data filter remains
    assert "PartitionFilters: [isnotnull(lang" in plan and "= en)" in plan
    assert "PushedFilters: []" in plan

    # row identity vs a post-scan filter of the unpartitioned original
    want = docs.filter("lang = 'en'").count()
    assert pruned.count() == want


def test_partitioned_mirror_two_level_pruning(spark, docs, tmp_path):
    from lawlm_spark.sources.mirror import scan_mirror_pruned, write_mirror_partitioned

    path = str(tmp_path / "part_mirror2")
    write_mirror_partitioned(docs, path, ["lang", "source"])
    one = docs.select("lang", "source").first()
    pruned = scan_mirror_pruned(spark, path, lang=one["lang"], source=one["source"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert f"= {one['lang']})" in plan and f"= {one['source']})" in plan
    assert "PartitionFilters" in plan and "PushedFilters: []" in plan
    want = docs.filter(
        (F.col("lang") == one["lang"]) & (F.col("source") == one["source"])
    ).count()
    assert pruned.count() == want
