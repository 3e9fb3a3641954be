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
    order).  Pin the r18 window (VERDICT r17 item 1; regenerated at
    r18 session start with `ledger.py --emit-window` after the
    driver's r17 rows landed): first driver rows for the five r17
    registry additions, second rows for the r16-certified trio, the
    full r13-tier drain (7 entries — empties the tier), and the 35
    oldest r14-freshest recerts."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    r17_firsts = {
        "r16_sdm_window", "v82_incremental_mv", "r17_rocchio_expand",
        "v83_scd2_incremental", "v84_streaming_mv",
    }
    r16_seconds = {
        "r11_maxsim_topk", "v79_bounded_permute", "r12_maxsim_rerank",
    }
    r13_drain = {
        "d61_expectations", "d62_zscore_outliers",
        "d63_association_rules", "d65_feature_hash",
        "d67_dataset_card", "d68_modularity", "d71_pack_manifest",
    }
    r14_recerts = {
        "v74_enrichment_ttl", "v75_nfa_pattern", "v45_funnel",
        "v48_forward_asof", "v49_unpivot", "v50_lateral_topk",
        "v51_range_frame", "v52_variant", "v53_retention",
        "v55_asof_tolerance", "v59_rank_family", "v60_grouping_sets",
        "v61_filter_clause", "v62_null_semantics", "v65_not_in_trap",
        "v6_tpch_q1", "v23_tpch_q3", "v25_tpch_q5", "r3_uuid5_keys",
        "r1_rag_answer", "o1_rest_pipeline", "v33_streaming_ingest",
        "r4_hybrid_ann", "d8b_ann_multiprobe", "m1_multimodal_features",
        "v35_cube", "d1_exact_dedup", "d2_minhash_signatures",
        "d3_lsh_candidates", "d7_embedding_dups", "d8_ann_lsh_topk",
        "d9_embedding_dups_lsh", "v67_q21_shape", "v68_q20_shape",
        "v69_q22_shape",
    }
    cohorts = [r17_firsts, r16_seconds, r13_drain, r14_recerts]
    assert [len(c) for c in cohorts] == [5, 3, 7, 35]
    must_be_in = set().union(*cohorts)
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
