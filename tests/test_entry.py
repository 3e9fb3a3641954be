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
    order).  Pin the r17 window (VERDICT r16 item 1; regenerated at
    r17 session start with `ledger.py --emit-window` after the
    driver's r16 rows landed): first driver rows for the five r16
    registry additions, second rows for the five r15 additions (first
    rows r16), the two r12-tier leftovers, and the 38 oldest
    r13-freshest recerts."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    r16_firsts = {
        "r13_rm3_expand", "r14_crossenc_rerank", "v80_snapshot_diff",
        "v81_change_feed", "r15_sdm_proximity",
    }
    r15_seconds = {
        "r9_weighted_hybrid", "v78_permute_pattern", "r10_mmr_diversify",
        "d77_pareto_skyline", "d78_dsir_select",
    }
    r12_leftovers = {
        "d25_decontamination", "d31_unigram_nll",
    }
    r13_recerts = {
        "v73_match_measures", "d40_bigram_nll", "d32_temperature_mix",
        "d33_cluster_balance", "d45_weighted_sample", "v40_scd2",
        "v42_cogroup_asof", "v47_gap_fill", "v63_temporal_join",
        "d29_dup_spans", "d30_dup_span_removal", "d36_fuzzy_pairs",
        "d42_containment", "d54_prefix_join", "d57_hard_negatives",
        "d70_retrieval_metrics", "v54_streaming_hll", "v57_windowed_hll",
        "v58_debounce", "v64_streaming_cms", "v39_tpch_q13",
        "v56_tpch_q17", "v66_tpch_q19", "v44_recursive_cte",
        "d69b_equidepth_approx", "d26_domain_cap", "d27_quality_prune",
        "d28_corpus_report", "d34_jsonl_roundtrip", "d35_orc_roundtrip",
        "d39_zorder", "d41_bpe_tokens", "d44_ngram_novelty",
        "d46_ctfidf_topics", "d47_token_drift", "d56_gopher_rules",
        "d59_incremental_agg", "d60_skew_report",
    }
    cohorts = [r16_firsts, r15_seconds, r12_leftovers, r13_recerts]
    assert [len(c) for c in cohorts] == [5, 5, 2, 38]
    must_be_in = set().union(*cohorts)
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
