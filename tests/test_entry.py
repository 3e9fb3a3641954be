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
    order).  Pin the r8 drain window (COVERAGE.md ledger / VERDICT r7
    items 1+3): the d68 recert + the final 42 never-certified first
    rows + 7 consecutive-second-row slots.  After this window, zero
    never-certified entries remain; rotation resumes r9."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    recert = {"d68_modularity"}  # r7's only red row (signed zero), fixed
    first_rows = {
        "d26_domain_cap", "d27_quality_prune", "d28_corpus_report",
        "d34_jsonl_roundtrip", "d35_orc_roundtrip", "d39_zorder",
        "d41_bpe_tokens", "d44_ngram_novelty", "d46_ctfidf_topics",
        "d47_token_drift", "d56_gopher_rules", "d58_cluster_qa",
        "d59_incremental_agg", "d60_skew_report", "d61_expectations",
        "d62_zscore_outliers", "d63_association_rules", "d65_feature_hash",
        "d67_dataset_card", "d71_pack_manifest", "v39_tpch_q13",
        "v44_recursive_cte", "v45_funnel", "v48_forward_asof",
        "v49_unpivot", "v50_lateral_topk", "v51_range_frame",
        "v52_variant", "v53_retention", "v54_streaming_hll",
        "v55_asof_tolerance", "v56_tpch_q17", "v57_windowed_hll",
        "v58_debounce", "v59_rank_family", "v60_grouping_sets",
        "v61_filter_clause", "v62_null_semantics", "v64_streaming_cms",
        "v65_not_in_trap", "v66_tpch_q19", "d69b_equidepth_approx",
    }
    second_rows = {
        # the most state-intricate r7 first-greens
        "v38_stream_outer_join", "v41_stateful_timeout",
        "v43_cdc_stream_apply", "v46_dedup_within_watermark",
        "d37_pagerank", "r6_pq_adc", "r7_ivfpq",
    }
    must_be_in = recert | first_rows | second_rows
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
