"""Driver-contract sanity: queries()/oracle_sql() alignment and smoke of
cheap entries.  Full oracle equivalence is exercised by selfcheck.py."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
ROWS_ONLY = {"r3_uuid5_keys", "o1_rest_pipeline", "d13_ivf_topk", "o4_full_pipeline"}


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
