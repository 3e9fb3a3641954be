"""operators/tuning.py: the operator-scoped AQE coalescing policy
(optimization r18) must apply inside the block and never leak out —
the wrapped operators (pagerank, connected_components, d12/d21
curation) run inside shared sessions (bench, driver) where a leaked
conf would silently re-plan every later query."""

import pytest
from pyspark.sql import functions as F

from lawlm_spark.operators.tuning import _KEY, coalesced_shuffles

pytestmark = pytest.mark.usefixtures()


def test_sets_inside_and_restores_unset(spark):
    # the lawlm session does not set the key: get -> None means unset
    spark.conf.unset(_KEY)
    assert spark.conf.get(_KEY, None) is None
    with coalesced_shuffles(spark):
        assert spark.conf.get(_KEY) == "false"
    assert spark.conf.get(_KEY, None) is None


def test_restores_previous_explicit_value(spark):
    spark.conf.set(_KEY, "true")
    try:
        with coalesced_shuffles(spark):
            assert spark.conf.get(_KEY) == "false"
        assert spark.conf.get(_KEY) == "true"
    finally:
        spark.conf.unset(_KEY)


def test_restores_on_raise(spark):
    spark.conf.unset(_KEY)
    with pytest.raises(RuntimeError, match="boom"):
        with coalesced_shuffles(spark):
            raise RuntimeError("boom")
    assert spark.conf.get(_KEY, None) is None


def test_wrapped_operators_leave_session_clean(spark):
    # end-to-end: pagerank and connected_components opt in internally;
    # after they return, the session conf must be back to unset.
    from lawlm_spark.operators.components import connected_components
    from lawlm_spark.operators.pagerank import pagerank

    spark.conf.unset(_KEY)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    comp = {
        (r["node"], r["component_id"])
        for r in connected_components(pairs).collect()
    }
    assert comp == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert spark.conf.get(_KEY, None) is None

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    ranks = pagerank(edges, iterations=2)
    # symmetric 3-cycle: every node has the same rank
    vals = {r["rank"] for r in ranks.collect()}
    assert len(vals) == 1
    assert spark.conf.get(_KEY, None) is None
