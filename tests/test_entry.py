"""Driver-contract sanity: queries()/oracle_sql() alignment and smoke of
cheap entries.  Full oracle equivalence is exercised by selfcheck.py."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
ROWS_ONLY = {"o1_rest_pipeline", "d13_ivf_topk", "o4_full_pipeline", "d41_bpe_tokens"}


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    assert q - o == ROWS_ONLY  # every query has an oracle except declared rows-only


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"query_id", "question", "n_sources", "context", "summary"} <= set(df.columns)


def test_sample_queries_run(spark):
    qs = entrymod.queries()
    for name in ["v1_scan_filter_project", "v7_topk_window", "d1_exact_dedup"]:
        df = qs[name](spark, SF)
        assert df.count() > 0, name


def test_certification_window_membership():
    """The driver certifies exactly the FIRST 50 queries() keys (dict
    order).  Pin the r9 rotation window (COVERAGE.md r9/r10 schedule /
    VERDICT r8 item 1): second driver rows for the single-green cohort,
    oldest green first — all 33 r7-first-greens + the 17 most
    state-intricate r8 first-greens."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    r7_seconds = {
        "d38_semdedup", "d51_triangles", "d66_label_prop", "r8_sq8_topk",
        "d48_hll_distinct", "d49_cms_heavy_hitters", "d52_bloom_prune",
        "d53_quantile_hist", "d55_kmv_intersect", "d64_join_cardinality",
        "d69_equidepth_bins", "d72_winsorize", "d73_cms_drift",
        "d24_repetition", "d25_decontamination", "d31_unigram_nll",
        "d40_bigram_nll", "d32_temperature_mix", "d33_cluster_balance",
        "d45_weighted_sample", "d50_group_split", "v40_scd2",
        "v42_cogroup_asof", "v47_gap_fill", "v63_temporal_join",
        "d29_dup_spans", "d30_dup_span_removal", "d36_fuzzy_pairs",
        "d42_containment", "d43_curate_with_containment",
        "d54_prefix_join", "d57_hard_negatives", "d70_retrieval_metrics",
    }
    r8_seconds = {
        "v54_streaming_hll", "v57_windowed_hll", "v58_debounce",
        "v64_streaming_cms", "v39_tpch_q13", "v56_tpch_q17",
        "v66_tpch_q19", "v44_recursive_cte", "d69b_equidepth_approx",
        "d26_domain_cap", "d27_quality_prune", "d28_corpus_report",
        "d34_jsonl_roundtrip", "d35_orc_roundtrip", "d39_zorder",
        "d41_bpe_tokens", "d44_ngram_novelty",
    }
    assert len(r7_seconds) == 33 and len(r8_seconds) == 17
    must_be_in = r7_seconds | r8_seconds
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
