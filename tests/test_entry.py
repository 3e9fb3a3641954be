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
    order).  Pin the r11 window (VERDICT r10 item 1; the NEXT_WINDOW
    list `precert --next` pre-validated at the r10 final HEAD): first
    rows for the two r10 registry additions, second rows for the five
    r9 additions, the 28 r5-freshest recerts, and the 15 oldest
    r6-freshest recerts."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    r10_firsts = {
        "v71_match_recognize", "v72_stream_enrichment",
    }
    r9_seconds = {
        "v67_q21_shape", "v68_q20_shape", "v69_q22_shape", "v70_q2_shape",
        "d74_winnowing",
    }
    r5_recerts = {
        "d16_token_packing", "m2_frame_sampling", "m3_resize",
        "o2_sources_projection", "o3_enhanced_processing", "r2_mirror_stats",
        "d10_text_analytics", "d11_token_stats", "v18_session_windows",
        "v1_scan_filter_project", "v2_coalesce_provenance", "v3_anti_join",
        "v3_join_family", "v3_semi_join", "v3_outer_join",
        "v4_distinct_count", "v4_dup_audit", "v5_latest_by",
        "v6_rollup", "v7_topk_window", "v8_rrf_fusion",
        "v13_set_ops", "v13_set_ops_all", "v14_sliding_counts",
        "v14_window_counts", "v15_json", "v16_scalar_funcs",
        "v17_analytic_window",
    }
    r6_recerts = {
        "o4_full_pipeline", "d16b_token_packing_sharded", "r5_salted_join",
        "v36_stateful_totals", "r5_ivf_prebuilt", "d13_ivf_topk",
        "v9_bm25_map", "v9_bm25_index", "v9_bm25_topk", "v10_cosine_topk",
        "v11_regex_extract", "v11_citations", "v12_chunk_keys",
        "v14_streaming_counts", "v19_asof_join",
    }
    cohorts = [r10_firsts, r9_seconds, r5_recerts, r6_recerts]
    assert [len(c) for c in cohorts] == [2, 5, 28, 15]
    must_be_in = set().union(*cohorts)
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
