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
    order).  Pin the r15 window (VERDICT r14 item 1; regenerated at
    r15 session start with `ledger.py --emit-window` after the
    driver's r14 rows displaced the r14-end draft): first driver rows
    for the five r14 registry additions, all 36 r11-freshest recerts
    (draining the r11 tier), and the 9 oldest r12-freshest."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    r14_firsts = {
        "r9_weighted_hybrid", "v78_permute_pattern", "r10_mmr_diversify",
        "d77_pareto_skyline", "d78_dsir_select",
    }
    r11_recerts = {
        "d11_token_stats", "v18_session_windows", "v1_scan_filter_project",
        "v2_coalesce_provenance", "v3_anti_join", "v3_join_family",
        "v3_semi_join", "v3_outer_join", "v4_distinct_count",
        "v4_dup_audit", "v5_latest_by", "v6_rollup", "v7_topk_window",
        "v8_rrf_fusion", "v13_set_ops", "v13_set_ops_all",
        "v14_sliding_counts", "v14_window_counts", "v15_json",
        "v16_scalar_funcs", "v17_analytic_window", "o4_full_pipeline",
        "d16b_token_packing_sharded", "r5_salted_join",
        "v36_stateful_totals", "r5_ivf_prebuilt", "d13_ivf_topk",
        "v9_bm25_map", "v9_bm25_index", "v9_bm25_topk", "v10_cosine_topk",
        "v11_regex_extract", "v11_citations", "v12_chunk_keys",
        "v14_streaming_counts", "v19_asof_join",
    }
    r12_recerts = {
        "v71_match_recognize", "v72_stream_enrichment",
        "v20_udtf_sentences", "v21_pivot", "v22_exists_subquery",
        "v24_range_join", "v26_scalar_subquery", "v27_percentiles",
        "v28_query_prefix",
    }
    cohorts = [r14_firsts, r11_recerts, r12_recerts]
    assert [len(c) for c in cohorts] == [5, 36, 9]
    must_be_in = set().union(*cohorts)
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
