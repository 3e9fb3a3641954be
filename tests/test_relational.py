"""Relational/incremental operators O4/O21-O25."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawlm_spark.operators.relational import (
    anti_join_new,
    coalesce_with_provenance,
    distinct_keys,
    dup_audit,
    latest_by,
    run_counters,
)


def test_coalesce_with_provenance(spark):
    df = spark.createDataFrame(
        [(1, None, "b1"), (2, "a2", "b2"), (3, None, None), (4, "  ", "b4")],
        ["id", "a", "b"],
    )
    cols = coalesce_with_provenance([("a", F.col("a")), ("b", F.col("b"))], value_name="v")
    rows = {r["id"]: r for r in df.select("id", cols["v"].alias("v"), cols["source_field"].alias("s")).collect()}
    assert (rows[1]["v"], rows[1]["s"]) == ("b1", "b")
    assert (rows[2]["v"], rows[2]["s"]) == ("a2", "a")
    assert (rows[3]["v"], rows[3]["s"]) == (None, None)
    assert (rows[4]["v"], rows[4]["s"]) == ("b4", "b")  # blank counts as missing


def test_anti_join_incremental(spark):
    incoming = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    processed = spark.createDataFrame([(i,) for i in range(0, 10, 2)], ["k"])
    got = sorted(r["k"] for r in anti_join_new(incoming, processed, "k").collect())
    assert got == [1, 3, 5, 7, 9]


def test_latest_by_deterministic_under_repartition(spark, events):
    a = latest_by(events, ["user_id"], "ts", ["event_id"]).select("user_id", "event_id")
    b = latest_by(events.repartition(13), ["user_id"], "ts", ["event_id"]).select(
        "user_id", "event_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dup_audit_and_distinct_keys(spark):
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "v"])
    audited = dup_audit(df, ["k"]).collect()
    assert len(audited) == 1 and audited[0]["k"] == 1 and audited[0]["n"] == 2
    assert distinct_keys(df, "k").count() == 2


def test_run_counters(spark, events):
    row = run_counters(
        events,
        {"n": F.count("*"), "users": F.countDistinct("user_id"), "total": F.round(F.sum("value"), 2)},
    ).collect()[0]
    assert row["n"] == events.count()
    assert row["users"] > 0 and row["total"] is not None


def test_scd2_intervals_collapse_and_current(spark):
    from lawlm_spark.operators.relational import scd2_intervals

    rows = [
        # user 1: a a b a -> intervals a[1,3) b[3,4) a[4,None)
        (1, 1, 10, "a"), (1, 2, 11, "a"), (1, 3, 12, "b"), (1, 4, 13, "a"),
        # user 2: single event -> one current row
        (2, 5, 20, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, event_type string")
    got = sorted(
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_intervals(df, "user_id", "ts", "event_type", ["event_id"]).collect()
    )
    assert got == [
        (1, "a", 1, 3, False),
        (1, "a", 4, None, True),
        (1, "b", 3, 4, False),
        (2, "x", 5, None, True),
    ]


def test_scd2_single_exchange(spark):
    from lawlm_spark.operators.relational import scd2_intervals

    df = spark.createDataFrame([(1, 1, 1, "a")], "user_id long, ts long, event_id long, event_type string")
    plan = scd2_intervals(df, "user_id", "ts", "event_type", ["event_id"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # both windows share partitioning+sort


def test_agg_state_merge_equals_whole(spark, events):
    from pyspark.sql import functions as F
    from lawlm_spark.operators.relational import agg_state, merge_agg_states

    ev = events.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    whole = agg_state(ev, ["event_type"], F.col("v"))
    a = agg_state(ev.filter("event_id % 2 = 0"), ["event_type"], F.col("v"))
    b = agg_state(ev.filter("event_id % 2 = 1"), ["event_type"], F.col("v"))
    merged = merge_agg_states(a, b, ["event_type"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_agg_state_fold_order_invariant(spark, events):
    """Folding batches in any order yields the same state — the
    associativity that makes per-batch states artifacts."""
    from pyspark.sql import functions as F
    from lawlm_spark.operators.relational import agg_state, merge_agg_states

    ev = events.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    parts = [
        agg_state(ev.filter(f"event_id % 3 = {i}"), ["event_type"], F.col("v"))
        for i in range(3)
    ]
    fwd = merge_agg_states(
        merge_agg_states(parts[0], parts[1], ["event_type"]), parts[2], ["event_type"]
    )
    rev = merge_agg_states(
        merge_agg_states(parts[2], parts[0], ["event_type"]), parts[1], ["event_type"]
    )
    assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, rev.collect()))


def test_temporal_lookup_no_fanout_and_correct_version(spark):
    from pyspark.sql import functions as F
    from lawlm_spark.operators.relational import scd2_intervals, temporal_lookup

    sec = 1_000_000
    # user 1 state history: A from t=0, B from t=100, C from t=200
    log = spark.createDataFrame(
        [(1, 0, 1, "A"), (1, 100 * sec, 2, "B"), (1, 200 * sec, 3, "C")],
        "user_id long, us long, event_id long, state string",
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_id", "state")
    dim = scd2_intervals(log, "user_id", "ts", "state", ["event_id"])
    facts = spark.createDataFrame(
        [(1, 10, 50 * sec), (1, 11, 100 * sec), (1, 12, 500 * sec), (2, 13, 50 * sec)],
        "user_id long, fid long, us long",
    ).select("user_id", "fid", F.timestamp_micros(F.col("us")).alias("ts"))
    out = temporal_lookup(facts, dim, "user_id", "ts")
    assert out.count() == facts.count()  # disjoint intervals: no fanout
    got = {r["fid"]: r["state"] for r in out.collect()}
    assert got[10] == "A"        # mid-interval
    assert got[11] == "B"        # boundary: valid_from inclusive
    assert got[12] == "C"        # open current row
    assert got[13] is None       # unknown user under how='left'


# ----------------------------------- incremental MV over a change feed


def _mv_feed(spark, rows):
    return spark.createDataFrame(
        rows,
        "k long, op string, grp_old string, grp_new string, "
        "v_old long, v_new long",
    )


def _mv_keys():
    return (
        {"grp": F.col("grp_old")},
        {"grp": F.col("grp_new")},
    )


def test_fold_change_feed_insert_update_delete(spark):
    from lawlm_spark.operators.relational import (
        distributive_state,
        fold_change_feed,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, grp string, v long"
    )
    state = distributive_state(base, {"grp": F.col("grp")}, F.col("v"))
    feed = _mv_feed(spark, [
        (4, "I", None, "a", None, 40),     # insert into a
        (2, "U", "a", "a", 20, 25),        # in-place value update
        (3, "D", "b", None, 30, None),     # delete b's only row
    ])
    ko, kn = _mv_keys()
    out = fold_change_feed(
        state, feed, ko, kn, F.col("v_old"), F.col("v_new")
    ).collect()
    got = {r["grp"]: (r["m_cnt"], r["m_sum"]) for r in out}
    # a: {10, 25, 40}; b: emptied out and must LEAVE the view
    assert got == {"a": (3, 75)}


def test_fold_change_feed_group_migration(spark):
    """An update that moves a row between view groups retracts from the
    old group and inserts into the new one."""
    from lawlm_spark.operators.relational import (
        distributive_state,
        fold_change_feed,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, grp string, v long"
    )
    state = distributive_state(base, {"grp": F.col("grp")}, F.col("v"))
    feed = _mv_feed(spark, [(1, "U", "a", "b", 10, 11)])
    ko, kn = _mv_keys()
    out = fold_change_feed(
        state, feed, ko, kn, F.col("v_old"), F.col("v_new")
    ).collect()
    got = {r["grp"]: (r["m_cnt"], r["m_sum"]) for r in out}
    assert got == {"b": (2, 31)}  # a emptied; b gained the migrated row


def test_fold_change_feed_equals_direct_state(spark, events):
    """The oracle identity: folding the snapshot diff into the old
    state reproduces distributive_state of the new snapshot exactly."""
    from lawlm_spark.operators.relational import (
        distributive_state,
        fold_change_feed,
    )
    from lawlm_spark.streaming.cdc import snapshot_diff

    ev = events.select("event_id", "event_type", "value").limit(200)
    old = ev.filter("event_id % 4 != 0")
    new = ev.filter("event_id % 5 != 0").withColumn(
        "value", F.when(F.col("event_id") % 3 == 0,
                        F.col("value") * 2).otherwise(F.col("value"))
    )
    cents = lambda c: F.round(c * 100).cast("long")  # noqa: E731
    diff = snapshot_diff(
        old.select("event_id", "event_type", cents(F.col("value")).alias("v")),
        new.select("event_id", "event_type", cents(F.col("value")).alias("v")),
        ["event_id"],
    )
    ko = {"grp": F.col("event_type_old")}
    kn = {"grp": F.col("event_type_new")}
    state = distributive_state(
        old, {"grp": F.col("event_type")}, cents(F.col("value"))
    )
    folded = fold_change_feed(
        state, diff, ko, kn, F.col("v_old"), F.col("v_new")
    )
    direct = distributive_state(
        new, {"grp": F.col("event_type")}, cents(F.col("value"))
    )
    as_rows = lambda df: sorted(  # noqa: E731
        (r["grp"], r["m_cnt"], r["m_sum"]) for r in df.collect()
    )
    assert as_rows(folded) == as_rows(direct)


def test_fold_change_feed_key_mismatch_raises(spark):
    import pytest

    from lawlm_spark.operators.relational import fold_change_feed

    feed = _mv_feed(spark, [])
    with pytest.raises(ValueError, match="key name mismatch"):
        fold_change_feed(
            feed.limit(0), feed, {"a": F.col("grp_old")},
            {"b": F.col("grp_new")}, F.col("v_old"), F.col("v_new")
        )


def test_fold_change_feed_single_keyed_exchange(spark):
    """Plan contract: feed rows explode map-side into <= 2 deltas; the
    union with the state runs ONE keyed aggregate — no join at all."""
    from lawlm_spark.operators.relational import (
        distributive_state,
        fold_change_feed,
    )

    base = spark.createDataFrame([(1, "a", 10)], "k long, grp string, v long")
    state = distributive_state(base, {"grp": F.col("grp")}, F.col("v"))
    feed = _mv_feed(spark, [(2, "I", None, "a", None, 5)])
    ko, kn = _mv_keys()
    plan = (
        fold_change_feed(state, feed, ko, kn, F.col("v_old"), F.col("v_new"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "CartesianProduct"):
        assert node not in plan, plan


# -------------------------------------- incremental SCD2 maintenance


def _scd2_rows(df):
    return sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )


def test_scd2_increment_equals_full_rebuild(spark):
    """The oracle identity: folding ts-ordered batches == one
    scd2_intervals over the whole log."""
    from lawlm_spark.operators.relational import (
        scd2_apply_increment,
        scd2_intervals,
    )

    log = spark.createDataFrame(
        [
            # key 1: a -> a -> b -> b -> c  (collapse + transitions)
            (1, 10, "a", 1), (1, 20, "a", 2), (1, 30, "b", 3),
            (1, 40, "b", 4), (1, 50, "c", 5),
            # key 2: single value across the cut (open row must EXTEND)
            (2, 15, "x", 6), (2, 45, "x", 7),
            # key 3: appears only in the increment (new key)
            (3, 35, "q", 8), (3, 55, "r", 9),
            # key 4: history only, untouched by any increment
            (4, 5, "z", 10), (4, 12, "y", 11),
        ],
        "k long, ts long, attr string, seq long",
    )
    full = scd2_intervals(log, "k", "ts", "attr", ["seq"])
    dim = scd2_intervals(log.filter("ts <= 25"), "k", "ts", "attr", ["seq"])
    dim = scd2_apply_increment(
        dim, log.filter("ts > 25 AND ts <= 42"), "k", "ts", "attr", ["seq"]
    )
    dim = scd2_apply_increment(
        dim, log.filter("ts > 42"), "k", "ts", "attr", ["seq"]
    )
    assert _scd2_rows(dim) == _scd2_rows(full)


def test_scd2_increment_untouched_keys_have_no_window(spark):
    """Plan contract: history passes through broadcast joins only; the
    single window runs over seed ∪ batch (the dimension itself is
    never window-partitioned)."""
    from lawlm_spark.operators.relational import (
        scd2_apply_increment,
        scd2_intervals,
    )

    log = spark.createDataFrame(
        [(1, 10, "a", 1), (2, 20, "b", 2)], "k long, ts long, attr string, seq long"
    )
    dim = scd2_intervals(log, "k", "ts", "attr", ["seq"])
    batch = spark.createDataFrame(
        [(1, 30, "c", 3)], "k long, ts long, attr string, seq long"
    )
    plan = (
        scd2_apply_increment(dim, batch, "k", "ts", "attr", ["seq"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the dim side meets the batch keys via broadcast (semi + anti)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert node not in plan, plan


def test_fold_change_feed_negative_count_raises(spark):
    """A feed that retracts more rows than the state holds (double-
    applied or wrong-state batch) must raise, not silently drop the
    group."""
    import pytest

    from lawlm_spark.operators.relational import (
        distributive_state,
        fold_change_feed,
    )

    base = spark.createDataFrame([(1, "a", 10)], "k long, grp string, v long")
    state = distributive_state(base, {"grp": F.col("grp")}, F.col("v"))
    feed = _mv_feed(spark, [
        (1, "D", "a", None, 10, None),
        (2, "D", "a", None, 3, None),  # second retraction: count -> -1
    ])
    ko, kn = _mv_keys()
    out = fold_change_feed(
        state, feed, ko, kn, F.col("v_old"), F.col("v_new")
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "does not correspond to this state" in str(ei.value)


def test_fold_change_feed_zero_count_residual_sum_raises(spark):
    """r17 review: a retraction carrying the WRONG value folds the
    group to (0, nonzero) — measure mass would silently vanish; it
    must raise."""
    import pytest

    from lawlm_spark.operators.relational import (
        distributive_state,
        fold_change_feed,
    )

    base = spark.createDataFrame([(1, "a", 100)], "k long, grp string, v long")
    state = distributive_state(base, {"grp": F.col("grp")}, F.col("v"))
    feed = _mv_feed(spark, [(1, "D", "a", None, 90, None)])  # stale v_old
    ko, kn = _mv_keys()
    out = fold_change_feed(
        state, feed, ko, kn, F.col("v_old"), F.col("v_new")
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "does not correspond to this state" in str(ei.value)


def test_scd2_increment_out_of_order_batch_raises(spark):
    """r17 review: a batch row at or before its key's last transition
    ts violates the append-only contract and must raise, not corrupt
    the rebuilt history."""
    import pytest

    from lawlm_spark.operators.relational import (
        scd2_apply_increment,
        scd2_intervals,
    )

    log = spark.createDataFrame(
        [(1, 10, "a", 1), (1, 20, "b", 2)], "k long, ts long, attr string, seq long"
    )
    dim = scd2_intervals(log, "k", "ts", "attr", ["seq"])
    # open row for key 1 has valid_from=20; a batch at ts=15 is stale
    stale = spark.createDataFrame(
        [(1, 15, "c", 3)], "k long, ts long, attr string, seq long"
    )
    out = scd2_apply_increment(dim, stale, "k", "ts", "attr", ["seq"])
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "append-only" in str(ei.value)


# ---------------------------------------------------- enrich_changes


def _enrich_fixture(spark):
    from pyspark.sql import functions as F

    target = spark.createDataFrame(
        [(1, 50.0), (2, 250.0), (3, 450.0)], "k long, bal double"
    )
    dim = spark.createDataFrame(
        [(0, "low"), (1, "mid"), (2, "high"), (3, "vip"), (4, "x4")],
        "tier_id long, tier_name string",
    )
    tier = lambda c: (F.floor(F.col(c) / 100)).cast("long")  # noqa: E731
    return target, dim, tier


def test_enrich_changes_migration_delete_and_missing_key(spark):
    """The three contract points: an update whose derived key migrated
    picks up the NEW dim attrs; a delete passes with NULL enrichment;
    a key absent from the dim enriches to NULL (left join)."""
    from pyspark.sql import functions as F

    from lawlm_spark.operators.relational import enrich_changes

    _, dim, tier = _enrich_fixture(spark)
    changes = spark.createDataFrame(
        [
            (1, 350.0, "U", 1),   # 50 -> 350: tier 0 -> 3 (migration)
            (2, None, "D", 2),    # delete: enrichment must be NULL
            (4, 990.0, "I", 3),   # tier 9: not in dim -> NULL
        ],
        "k long, bal double, op string, seq long",
    )
    out = enrich_changes(changes, dim, tier("bal"), "tier_id")
    rows = {r["k"]: (r["op"], r["tier_name"]) for r in out.collect()}
    assert rows == {1: ("U", "vip"), 2: ("D", None), 4: ("I", None)}


def test_enrich_changes_fold_equals_snapshot_join(spark):
    """The IVM-for-joins identity: folding enriched batches through
    merge_changes equals joining the FINAL snapshot to the dim — the
    enriched view stays fresh without ever re-joining the snapshot."""
    from pyspark.sql import functions as F

    from lawlm_spark.operators.relational import enrich_changes, merge_changes

    target, dim, tier = _enrich_fixture(spark)
    view = target.join(
        F.broadcast(dim), tier("bal") == F.col("tier_id"), "left"
    ).select("k", "bal", "tier_name")
    batches = [
        spark.createDataFrame(
            [(1, 350.0, "U", 1), (3, None, "D", 2)],
            "k long, bal double, op string, seq long",
        ),
        spark.createDataFrame(
            [(1, 40.0, "U", 3), (5, 120.0, "I", 4)],
            "k long, bal double, op string, seq long",
        ),
    ]
    for b in batches:
        view = merge_changes(
            view, enrich_changes(b, dim, tier("bal"), "tier_id"),
            "k", ["seq"],
        )
    final = merge_changes(
        target,
        batches[0].unionByName(batches[1]),
        "k", ["seq"],
    )
    want = final.join(
        F.broadcast(dim), tier("bal") == F.col("tier_id"), "left"
    ).select("k", "bal", "tier_name")
    got = sorted(tuple(r) for r in view.collect())
    exp = sorted(tuple(r) for r in want.collect())
    assert got == exp == [
        (1, 40.0, "low"), (2, 250.0, "high"), (5, 120.0, "mid")
    ]


def test_enrich_changes_rejects_column_clash(spark):
    import pytest
    from pyspark.sql import functions as F

    from lawlm_spark.operators.relational import enrich_changes

    changes = spark.createDataFrame(
        [(1, 1.0, "U", 1)], "k long, bal double, op string, seq long"
    )
    dim = spark.createDataFrame([(0, 9.9)], "tier_id long, bal double")
    with pytest.raises(ValueError, match="collide"):
        enrich_changes(changes, dim, F.lit(0), "tier_id")
