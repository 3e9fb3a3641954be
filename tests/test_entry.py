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
    order).  Pin the r16 window (VERDICT r15 items 1-2; regenerated at
    r16 session start with `ledger.py --emit-window` after the
    driver's r15 rows landed, plus the changed-text jumps from the
    cache_registry fix): first driver rows for the three r15 registry
    additions, second rows for the four r13 additions, the five
    changed-text recerts, and the 38 oldest r12-freshest recerts."""
    keys = list(entrymod.queries())
    window = set(keys[:50])
    r15_firsts = {
        "r11_maxsim_topk", "v79_bounded_permute", "r12_maxsim_rerank",
    }
    r13_seconds = {
        "v76_bounded_pattern", "v77_alternation_pattern",
        "d75_semdedup_capped", "d76_lsh_refined",
    }
    changed_text = {
        "d15_components_dedup", "d50_group_split", "d58_cluster_qa",
        "d12_curation", "d43_curate_with_containment",
    }
    r12_recerts = {
        "v29_grouped_udaf", "v30_stream_static_join",
        "v31_stream_stream_join", "v32_streaming_dedup",
        "d14_salted_agg", "d4_jaccard_pairs", "d5_minhash_dedup",
        "d6_simhash", "d17_hash_sample", "d18_hash_split",
        "d19_training_mix", "d20_incremental_neardup",
        "d21_curate_mix_pack", "d22_pii_scrub", "d23_boilerplate",
        "v37_streaming_neardup", "v34_streaming_sessions",
        "v38_stream_outer_join", "v41_stateful_timeout",
        "v43_cdc_stream_apply", "v46_dedup_within_watermark",
        "d37_pagerank", "r6_pq_adc", "r7_ivfpq", "d38_semdedup",
        "d51_triangles", "d66_label_prop", "r8_sq8_topk",
        "d48_hll_distinct", "d49_cms_heavy_hitters", "d52_bloom_prune",
        "d53_quantile_hist", "d55_kmv_intersect", "d64_join_cardinality",
        "d69_equidepth_bins", "d72_winsorize", "d73_cms_drift",
        "d24_repetition",
    }
    cohorts = [r15_firsts, r13_seconds, changed_text, r12_recerts]
    assert [len(c) for c in cohorts] == [3, 4, 5, 38]
    must_be_in = set().union(*cohorts)
    assert must_be_in <= window, sorted(must_be_in - window)
    assert len(must_be_in) == 50  # the window is exactly these cohorts
