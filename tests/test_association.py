"""Association rules (operators/association.py)."""

from __future__ import annotations

from lawlm_spark.operators.association import association_rules


def test_association_rules_hand_case(spark):
    """Baskets: {A,B} x3, {A,C} x1, {B} x1 -> conf(A->B)=0.75,
    lift(A->B) = 5*3/(4*4) = 0.9375; direction matters."""
    rows = []
    for i in range(3):
        rows += [(i, "A"), (i, "B")]
    rows += [(3, "A"), (3, "C"), (4, "B")]
    b = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(b, "bk", "it", min_pair_support=1, k=10).collect()
    }
    ab = got[("A", "B")]
    assert ab["n_both"] == 3 and ab["n_ante"] == 4 and ab["n_cons"] == 4
    assert ab["confidence"] == 0.75
    assert ab["lift"] == round(3 * 5 / (4 * 4), 6)
    ba = got[("B", "A")]
    assert ba["confidence"] == 0.75  # symmetric here since counts equal
    ac = got[("A", "C")]
    assert ac["confidence"] == 0.25 and ac["n_cons"] == 1
    # lift(A->C) = 1*5/(4*1) = 1.25 > lift(A->B): ranked higher
    assert ac["rank"] < ab["rank"]


def test_association_rules_duplicate_items_count_once(spark):
    b = spark.createDataFrame(
        [(0, "A"), (0, "A"), (0, "B"), (1, "A"), (1, "B")], "bk long, it string"
    )
    got = {
        (r["antecedent"], r["consequent"]): r["n_both"]
        for r in association_rules(b, "bk", "it", min_pair_support=1, k=10).collect()
    }
    assert got[("A", "B")] == 2  # basket 0's double-A counts once


def test_association_min_support_prunes(spark):
    b = spark.createDataFrame(
        [(0, "A"), (0, "B"), (1, "A"), (1, "C")], "bk long, it string"
    )
    got = association_rules(b, "bk", "it", min_pair_support=2, k=10).collect()
    assert got == []  # no pair co-occurs twice
