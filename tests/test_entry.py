"""Driver-contract sanity: queries()/oracle_sql() alignment and smoke of
cheap entries.  Full oracle equivalence is exercised by selfcheck.py."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
ROWS_ONLY = {"o1_rest_pipeline", "d13_ivf_topk", "o4_full_pipeline"}


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
    order).  Pin the r5 rotation (COVERAGE.md ledger): every entry that
    is new, was single-green in r4, or rotated out of the r4 window must
    sit inside positions 1-50; only entries with a green r4 driver row
    may sit at 51+."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    new_r5 = {
        "d16b_token_packing_sharded", "r5_salted_join", "v36_stateful_totals",
        "r5_ivf_prebuilt", "r3_uuid5_keys",
    }
    rotated_back_in = {
        "d1_exact_dedup", "d2_minhash_signatures", "d3_lsh_candidates",
        "v18_session_windows", "v1_scan_filter_project", "v2_coalesce_provenance",
        "v3_anti_join", "v3_join_family", "v3_semi_join", "v3_outer_join",
        "v4_distinct_count", "v4_dup_audit", "v5_latest_by", "v6_tpch_q1",
        "v6_rollup", "v7_topk_window", "v8_rrf_fusion", "v13_set_ops",
        "v13_set_ops_all", "v14_sliding_counts", "v14_window_counts",
        "v15_json", "v16_scalar_funcs", "v17_analytic_window",
    }
    single_green_r4 = {
        "m1_multimodal_features", "m2_frame_sampling", "m3_resize",
        "o2_sources_projection", "o3_enhanced_processing", "r2_mirror_stats",
        "d8b_ann_multiprobe", "r4_hybrid_ann", "v33_streaming_ingest",
        "d15_components_dedup", "d16_token_packing", "v34_streaming_sessions",
        "v35_cube",
    }
    held_for_consecutive = {
        "d7_embedding_dups", "d8_ann_lsh_topk", "d9_embedding_dups_lsh",
        "d10_text_analytics", "d11_token_stats", "d12_curation",
        "r1_rag_answer", "o1_rest_pipeline",
    }
    must_be_in = new_r5 | rotated_back_in | single_green_r4 | held_for_consecutive
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
