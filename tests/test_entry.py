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
    order).  Pin the r12 window (VERDICT r11 item 1; the NEXT_WINDOW
    list `precert --next` pre-validated at the r11 final HEAD): first
    row for the r11 registry addition, second rows for the two r10
    additions, the 15 remaining r6-freshest recerts, all 9
    r7-freshest, all 7 r8-freshest, and the 16 oldest r9-freshest."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    r11_firsts = {
        "v73_match_measures",
    }
    r10_seconds = {
        "v71_match_recognize", "v72_stream_enrichment",
    }
    r6_recerts = {
        "v20_udtf_sentences", "v21_pivot", "v22_exists_subquery",
        "v24_range_join", "v26_scalar_subquery", "v27_percentiles",
        "v28_query_prefix", "v29_grouped_udaf", "v30_stream_static_join",
        "v31_stream_stream_join", "v32_streaming_dedup", "d14_salted_agg",
        "d4_jaccard_pairs", "d5_minhash_dedup", "d6_simhash",
    }
    r7_recerts = {
        "d17_hash_sample", "d18_hash_split", "d19_training_mix",
        "d20_incremental_neardup", "d21_curate_mix_pack", "d22_pii_scrub",
        "d23_boilerplate", "v37_streaming_neardup", "v34_streaming_sessions",
    }
    r8_recerts = {
        "v38_stream_outer_join", "v41_stateful_timeout",
        "v43_cdc_stream_apply", "v46_dedup_within_watermark",
        "d37_pagerank", "r6_pq_adc", "r7_ivfpq",
    }
    r9_recerts = {
        "d38_semdedup", "d51_triangles", "d66_label_prop", "r8_sq8_topk",
        "d48_hll_distinct", "d49_cms_heavy_hitters", "d52_bloom_prune",
        "d53_quantile_hist", "d55_kmv_intersect", "d64_join_cardinality",
        "d69_equidepth_bins", "d72_winsorize", "d73_cms_drift",
        "d24_repetition", "d25_decontamination", "d31_unigram_nll",
    }
    cohorts = [r11_firsts, r10_seconds, r6_recerts, r7_recerts,
               r8_recerts, r9_recerts]
    assert [len(c) for c in cohorts] == [1, 2, 15, 9, 7, 16]
    must_be_in = set().union(*cohorts)
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
