"""Summation-order independence of the money/value aggregates (the r8
v23 class): the exact integer-cents forms must produce BIT-IDENTICAL
results under any physical partitioning — the double-sum forms they
replaced flipped cents at sf0.1 when Spark's partial-agg order diverged
from the oracle's sequential fold."""

from __future__ import annotations

import __spark_entry__ as em
from lawlm_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run_q3(spark, nparts):
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, SF, t).repartition(nparts).createOrReplaceTempView(t)
    return _rows(spark.sql(em._V23_TPCH_Q3_SQL))


def _run_q1(spark, nparts):
    # spark-engine SQL variant: the oracle dict text is DuckDB-specific
    # since r9 (HUGEINT `//` in disc_price/charge — see _exact_cents_sum)
    for t in ("lineitem",):
        load_table(spark, SF, t).repartition(nparts).createOrReplaceTempView(t)
    return _rows(spark.sql(em._v6_tpch_q1_sql("spark")))


def test_q3_revenue_partitioning_invariant(spark):
    assert _run_q3(spark, 1) == _run_q3(spark, 13) == _run_q3(spark, 32)


def test_q1_money_aggregates_partitioning_invariant(spark):
    assert _run_q1(spark, 1) == _run_q1(spark, 13) == _run_q1(spark, 32)


def test_doc_bounded_float_aggregate_partitioning_invariant(spark):
    """The float-triage boundary (NOTES_r08 §10, VERDICT r8 item 5):
    unconverted float aggregates are allowed ONLY where the summed
    group is doc-bounded, so the summation-error budget is independent
    of corpus scale.  Pin one representative — d31's avg_nll (per-doc
    mean NLL; each group is one document's tokens) must be
    bit-identical across 1/13/32 partitions.  If this ever flips, the
    aggregate joins the integer-exact class."""
    from lawlm_spark.operators.quality import unigram_nll

    docs = load_table(spark, SF, "documents")
    base = None
    for nparts in (1, 13, 32):
        got = _rows(unigram_nll(docs.repartition(nparts), vocab_size=1000))
        if base is None:
            base = got
        assert got == base, nparts


def test_window_total_value_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from lawlm_spark.streaming.events import tumbling_window_counts

    ev = load_table(spark, SF, "events")
    base = None
    for nparts in (1, 13, 32):
        got = _rows(
            tumbling_window_counts(ev.repartition(nparts)).select(
                "window_start", "event_type", "n", "total_value"
            )
        )
        if base is None:
            base = got
        assert got == base, nparts
