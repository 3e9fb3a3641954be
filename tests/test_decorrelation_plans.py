"""Plan-shape pins for the four TPC-H decorrelation stressors
(v67 Q21 / v68 Q20 / v69 Q22 / v70 Q2, NOTES_r09 §4/§4b).

These entries exist to exercise the subquery classes where Catalyst
and DuckDB are most likely to diverge semantically; their *performance*
claim is that Catalyst decorrelates each one fully — correlated
subqueries become equi-joins, uncorrelated scalar subqueries execute
once — so no per-outer-row subquery re-execution survives into the
physical plan.  At 100 TB a leaked nested-loop here is the difference
between a shuffle join and an O(n·m) catastrophe, so the shape is
pinned, not just observed.
"""

import re
from collections import Counter

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

_NODE_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct"
    # bare "Subquery" only: ReusedSubquery is a reference to an already-
    # counted subtree and SubqueryBroadcast is DPP plumbing — counting
    # either would let "N distinct one-time-executed subqueries" pass
    # on reuse markers alone
    r"|BroadcastNestedLoopJoin|LeftSemi|LeftAnti"
    r"|(?<!Reused)Subquery(?![A-Za-z])|HashAggregate"
    r"|SortAggregate)"
)


def _plan_nodes(spark, key):
    df = entry_mod.queries()[key](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return Counter(_NODE_RE.findall(plan)), plan


@pytest.mark.parametrize(
    "key", ["v67_q21_shape", "v68_q20_shape", "v69_q22_shape", "v70_q2_shape"]
)
def test_no_nested_loop_survives_decorrelation(spark, key):
    """The non-negotiable invariant: no CartesianProduct and no
    BroadcastNestedLoopJoin anywhere in the physical plan.  Either one
    means a correlation was NOT rewritten to an equi-join and the query
    re-evaluates a subquery per outer row (or materializes a cross
    product) — the exact failure mode these entries exist to detect."""
    nodes, plan = _plan_nodes(spark, key)
    assert nodes["CartesianProduct"] == 0, plan
    assert nodes["BroadcastNestedLoopJoin"] == 0, plan


def test_q21_shape_semi_and_anti_joins(spark):
    """v67's EXISTS and NOT EXISTS must surface as one semi and one
    anti equi-join into the fact table (hash or sort-merge — the
    strategy is AQE's choice; the join TYPE is the decorrelation)."""
    nodes, plan = _plan_nodes(spark, "v67_q21_shape")
    assert nodes["LeftSemi"] >= 1, plan
    assert nodes["LeftAnti"] >= 1, plan


def test_q20_shape_in_subquery_becomes_semi_join(spark):
    """v68's nested IN with a correlated scalar aggregate: the IN
    chain becomes semi joins and the correlated avg becomes a grouped
    aggregate joined back on the correlation key — so the plan holds
    >=1 semi join AND >=1 aggregate, with no loops (test above)."""
    nodes, plan = _plan_nodes(spark, "v68_q20_shape")
    assert nodes["LeftSemi"] >= 1, plan
    assert nodes["HashAggregate"] + nodes["SortAggregate"] >= 1, plan


def test_q22_shape_scalar_subqueries_execute_once(spark):
    """v69's two ungrouped scalar aggregates must appear as Subquery
    nodes (computed once, broadcast as literals) — NOT re-planned per
    row — and the NOT EXISTS as an anti equi-join."""
    nodes, plan = _plan_nodes(spark, "v69_q22_shape")
    assert nodes["Subquery"] >= 2, plan
    assert nodes["LeftAnti"] >= 1, plan


def test_q2_shape_correlated_min_becomes_group_join(spark):
    """v70's correlated scalar min over a multi-table join: the inner
    block becomes a groupBy(correlation key) aggregate equi-joined
    back, so the plan is pure hash/sort-merge joins + aggregates.  The
    dims (nation/region/supplier) are broadcast on BOTH the outer and
    decorrelated inner pipelines."""
    nodes, plan = _plan_nodes(spark, "v70_q2_shape")
    assert nodes["HashAggregate"] + nodes["SortAggregate"] >= 1, plan
    assert (
        nodes["BroadcastHashJoin"]
        + nodes["SortMergeJoin"]
        + nodes["ShuffledHashJoin"]
        >= 5
    ), plan
