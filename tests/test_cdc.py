"""operators/relational.merge_changes + streaming/cdc.py: CDC apply."""

from __future__ import annotations

import os
import tempfile
import uuid as uuidlib

import pytest

from lawlm_spark.operators.relational import merge_changes
from lawlm_spark.streaming import cdc

TGT_SCHEMA = "k long, name string, bal double"
CHG_SCHEMA = "k long, name string, bal double, op string, seq long"


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], TGT_SCHEMA
    )


def _rows(df):
    return sorted((r["k"], r["name"], r["bal"]) for r in df.collect())


def test_merge_update_insert_delete_and_seq_order(spark):
    changes = spark.createDataFrame(
        [
            (2, "b_old", 21.0, "U", 1),  # superseded by seq 5
            (2, "b_new", 22.0, "U", 5),
            (3, None, None, "D", 2),  # delete
            (4, "d", 40.0, "I", 3),  # insert (key not in target)
            (5, "e", 50.0, "D", 4),  # delete of an absent key: no-op
        ],
        CHG_SCHEMA,
    )
    out = merge_changes(_target(spark), changes, "k", ["seq"], "op")
    assert _rows(out) == [(1, "a", 10.0), (2, "b_new", 22.0), (4, "d", 40.0)]


def test_merge_reapply_is_noop(spark):
    changes = spark.createDataFrame(
        [(2, "x", 0.0, "U", 1), (3, None, None, "D", 2), (9, "i", 9.0, "U", 3)],
        CHG_SCHEMA,
    )
    once = merge_changes(_target(spark), changes, "k", ["seq"], "op")
    twice = merge_changes(once, changes, "k", ["seq"], "op")
    assert _rows(once) == _rows(twice)


_land_ordered = cdc.land_ordered_files


def _changes_df(spark):
    # seq-ordered log: update 1, delete 2, insert 6, then re-update 1,
    # resurrect 2, delete 6 — folding across batches must track order
    return spark.createDataFrame(
        [
            (1, "a1", 11.0, "U", 1),
            (2, None, None, "D", 2),
            (6, "f", 60.0, "I", 3),
            (1, "a2", 12.0, "U", 4),
            (2, "b2", 25.0, "U", 5),
            (6, None, None, "D", 6),
        ],
        CHG_SCHEMA,
    )


def test_stream_apply_equals_global_merge(spark):
    base = os.path.join(tempfile.gettempdir(), f"cdc_{uuidlib.uuid4().hex[:8]}")
    landing, state = os.path.join(base, "landing"), os.path.join(base, "state")
    changes = _changes_df(spark)
    parts = [changes.filter(f"seq > {i * 2} and seq <= {(i + 1) * 2}") for i in range(3)]
    _land_ordered(parts, landing)
    cdc.init_snapshot(_target(spark), state)
    cdc.stream_apply_changes(
        spark, landing, changes.schema, state, "k", ["seq"], "op",
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    got = _rows(cdc.current_snapshot(spark, state))
    want = _rows(merge_changes(_target(spark), changes, "k", ["seq"], "op"))
    assert got == want == [(1, "a2", 12.0), (2, "b2", 25.0), (3, "c", 30.0)]
    # only current+previous snapshot versions retained
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions) <= 2


def test_stream_apply_restart_after_crash(spark, monkeypatch):
    """Kill the job between the snapshot write and the pointer swap of
    the SECOND batch; restart on the same checkpoint must converge to
    the same final state with no double-apply."""
    base = os.path.join(tempfile.gettempdir(), f"cdcx_{uuidlib.uuid4().hex[:8]}")
    landing, state = os.path.join(base, "landing"), os.path.join(base, "state")
    changes = _changes_df(spark)
    parts = [changes.filter(f"seq > {i * 2} and seq <= {(i + 1) * 2}") for i in range(3)]
    _land_ordered(parts, landing)
    cdc.init_snapshot(_target(spark), state)

    real_swap = cdc._swap_pointer
    calls = {"n": 0}

    def crashing_swap(spark_, state_dir, version):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before pointer swap")
        real_swap(spark_, state_dir, version)

    monkeypatch.setattr(cdc, "_swap_pointer", crashing_swap)
    with pytest.raises(Exception, match="injected crash"):
        cdc.stream_apply_changes(
            spark, landing, changes.schema, state, "k", ["seq"], "op",
            checkpoint_dir=os.path.join(base, "ckpt"),
        )
    monkeypatch.setattr(cdc, "_swap_pointer", real_swap)
    cdc.stream_apply_changes(
        spark, landing, changes.schema, state, "k", ["seq"], "op",
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    got = _rows(cdc.current_snapshot(spark, state))
    assert got == _rows(merge_changes(_target(spark), changes, "k", ["seq"], "op"))


def test_stream_apply_restart_after_post_swap_crash(spark):
    """The OTHER crash window the module docstring claims is safe:
    pointer swapped but the stream checkpoint NOT committed.  The
    restart replays the batch, and the `prev == version` guard must
    short-circuit (no double-apply, no version churn) before the
    remaining batches fold normally."""
    base = os.path.join(tempfile.gettempdir(), f"cdcy_{uuidlib.uuid4().hex[:8]}")
    landing, state = os.path.join(base, "landing"), os.path.join(base, "state")
    changes = _changes_df(spark)
    parts = [changes.filter(f"seq > {i * 2} and seq <= {(i + 1) * 2}") for i in range(3)]
    _land_ordered(parts, landing)
    cdc.init_snapshot(_target(spark), state)

    def crash_post_swap(batch_id, phase):
        if phase == "post_swap" and batch_id == 1:
            raise RuntimeError("injected crash after pointer swap")

    with pytest.raises(Exception, match="injected crash"):
        cdc.stream_apply_changes(
            spark, landing, changes.schema, state, "k", ["seq"], "op",
            checkpoint_dir=os.path.join(base, "ckpt"),
            fault_injector=crash_post_swap,
        )
    # crashed AFTER the swap: the pointer already names batch 1's version
    assert cdc._read_pointer(spark, state) == "v1"
    cdc.stream_apply_changes(
        spark, landing, changes.schema, state, "k", ["seq"], "op",
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    got = _rows(cdc.current_snapshot(spark, state))
    assert got == _rows(merge_changes(_target(spark), changes, "k", ["seq"], "op"))
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions) <= 2


def test_init_snapshot_is_restart_safe(spark):
    base = os.path.join(tempfile.gettempdir(), f"cdci_{uuidlib.uuid4().hex[:8]}")
    state = os.path.join(base, "state")
    cdc.init_snapshot(_target(spark), state)
    # second bootstrap (process restart) must not clobber existing state
    cdc.init_snapshot(_target(spark).limit(0), state)
    assert _rows(cdc.current_snapshot(spark, state)) == _rows(_target(spark))


def test_time_travel_reads_previous_version(spark):
    base = os.path.join(tempfile.gettempdir(), f"cdct_{uuidlib.uuid4().hex[:8]}")
    landing, state = os.path.join(base, "landing"), os.path.join(base, "state")
    changes = _changes_df(spark)
    parts = [changes.filter(f"seq > {i * 2} and seq <= {(i + 1) * 2}") for i in range(3)]
    _land_ordered(parts, landing)
    cdc.init_snapshot(_target(spark), state)
    cdc.stream_apply_changes(
        spark, landing, changes.schema, state, "k", ["seq"], "op",
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    versions = cdc.list_versions(spark, state)
    assert len(versions) == 2  # previous + current
    prev, cur = versions
    # current == pointer read; previous == state before the LAST batch
    assert _rows(cdc.read_version(spark, state, cur)) == _rows(
        cdc.current_snapshot(spark, state)
    )
    two_batches = changes.filter("seq <= 4")
    assert _rows(cdc.read_version(spark, state, prev)) == _rows(
        merge_changes(_target(spark), two_batches, "k", ["seq"], "op")
    )
    with pytest.raises(FileNotFoundError, match="not retained"):
        cdc.read_version(spark, state, "v999")


def test_merge_changes_plan(spark):
    """Plan audit for the v43 batch core (VERDICT r6 item 3): the
    latest-change window is WindowGroupLimit-pruned (partial+final —
    each key's change history collapses to one row before the sort
    materializes) and BOTH wide ops key on the merge key: one exchange
    for the window, one for the full-outer apply join, nothing
    single-partition, nothing cartesian."""
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, name string, v int"
    )
    changes = spark.createDataFrame(
        [(1, "a2", 11, "U", 5), (3, "c", 30, "I", 6), (1, "a3", 12, "U", 7)],
        "k int, name string, v int, op string, seq int",
    )
    plan = (
        merge_changes(target, changes, "k", ["seq"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("WindowGroupLimit") >= 2
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning(k#" in ln]
    assert len(ex) == 2, plan  # window keying + apply join, both on the key


def test_merge_fold_equals_global_on_random_logs(spark):
    """Randomized differential for the v43 family: splitting a change
    log into seq-ordered batches and folding them one by one must land
    on exactly the same table as ONE global latest-op-wins merge — the
    property that makes per-micro-batch streaming apply correct.  A
    pure-Python replay cross-checks both."""
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        target_rows = [
            (k, f"t{k}", float(k)) for k in range(10) if rng.random() < 0.7
        ]
        target = spark.createDataFrame(
            target_rows, "k long, name string, bal double"
        )
        log = []
        for seq in range(1, 31):
            k = rng.randrange(14)
            op = rng.choice(["U", "U", "I", "D"])
            if op == "D":
                log.append((k, None, None, "D", seq))
            else:
                log.append((k, f"c{seq}", float(seq), op, seq))
        changes = spark.createDataFrame(log, CHG_SCHEMA)

        global_out = merge_changes(target, changes, "k", ["seq"], "op")

        cut1, cut2 = 10, 20
        folded = target
        for lo, hi in ((1, cut1), (cut1 + 1, cut2), (cut2 + 1, 30)):
            batch = changes.filter(f"seq between {lo} and {hi}")
            folded = merge_changes(folded, batch, "k", ["seq"], "op")

        # pure-Python replay: latest op per key wins
        state = {k: (name, v) for k, name, v in target_rows}
        latest = {}
        for k, name, v, op, seq in log:
            if k not in latest or seq > latest[k][3]:
                latest[k] = (name, v, op, seq)
        for k, (name, v, op, _) in latest.items():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = (name, v)
        expected = sorted((k, n, v) for k, (n, v) in state.items())

        assert _rows(global_out) == expected, f"seed {seed}: global != python"
        assert _rows(folded) == expected, f"seed {seed}: folded != python"


# ------------------------------------------------------------ snapshot_diff


def _diff_rows(df):
    return sorted(
        (r["k"], r["op"], r["name_old"], r["name_new"], r["bal_old"], r["bal_new"])
        for r in df.collect()
    )


def test_snapshot_diff_classifies_iud(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (5, None, None)], TGT_SCHEMA
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c2", 3.0), (4, "d", 4.0), (5, None, None)], TGT_SCHEMA
    )
    out = cdc.snapshot_diff(old, new, ["k"])
    assert _diff_rows(out) == [
        (1, "D", "a", None, 1.0, None),
        (3, "U", "c", "c2", 3.0, 3.0),
        (4, "I", None, "d", None, 4.0),
    ]  # k=2 unchanged, k=5 null==null unchanged (null-safe equality)


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], TGT_SCHEMA)
    new = spark.createDataFrame([(1, "a", 1.0)], TGT_SCHEMA)
    out = cdc.snapshot_diff(old, new, ["k"], include_unchanged=True)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["op"] is None
    assert cdc.snapshot_diff(old, new, ["k"]).count() == 0


def test_snapshot_diff_compare_cols_subset_and_validation(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], TGT_SCHEMA)
    new = spark.createDataFrame([(1, "a", 99.0)], TGT_SCHEMA)
    # name-only compare: the bal change is invisible
    assert cdc.snapshot_diff(old, new, ["k"], compare_cols=["name"]).count() == 0
    with pytest.raises(ValueError, match="absent"):
        cdc.snapshot_diff(old, new, ["k"], compare_cols=["nope"])
    with pytest.raises(ValueError, match="non-empty"):
        cdc.snapshot_diff(old, new, [])


def test_snapshot_diff_reconstructs_the_applied_change(spark):
    """End-to-end time-travel story: diff(previous, current) over the
    retained versioned states == exactly the net effect of the last
    batch (minimal change set, latest-op-wins)."""
    base = os.path.join(tempfile.gettempdir(), f"cdcd_{uuidlib.uuid4().hex[:8]}")
    landing, state = os.path.join(base, "landing"), os.path.join(base, "state")
    changes = _changes_df(spark)
    parts = [changes.filter(f"seq > {i * 2} and seq <= {(i + 1) * 2}") for i in range(3)]
    _land_ordered(parts, landing)
    cdc.init_snapshot(_target(spark), state)
    cdc.stream_apply_changes(
        spark, landing, changes.schema, state, "k", ["seq"], "op",
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    prev, cur = cdc.list_versions(spark, state)
    diff = cdc.snapshot_diff(
        cdc.read_version(spark, state, prev),
        cdc.read_version(spark, state, cur),
        ["k"],
    )
    # replaying the diff as a change log onto `previous` must yield
    # `current` (the diff IS a minimal CDC log)
    as_log = diff.selectExpr(
        "k",
        "coalesce(name_new, name_old) AS name",
        "coalesce(bal_new, bal_old) AS bal",
        "CASE WHEN op = 'D' THEN 'D' ELSE 'U' END AS op",
        "CAST(1 AS LONG) AS seq",
    )
    replayed = merge_changes(
        cdc.read_version(spark, state, prev), as_log, "k", ["seq"], "op"
    )
    assert _rows(replayed) == _rows(cdc.read_version(spark, state, cur))


def test_snapshot_diff_plan_single_join_no_extra_shuffle(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], TGT_SCHEMA)
    new = spark.createDataFrame([(1, "a", 2.0)], TGT_SCHEMA)
    plan = (
        cdc.snapshot_diff(old, new, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one join (the full-outer on the key); classification is
    # row-local project/filter
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


# --------------------------------------------------------------- change feed


def _feed_rows(df):
    return sorted(
        (r["batch"], r["k"], r["op"], r["name_old"], r["name_new"],
         r["bal_old"], r["bal_new"])
        for r in df.collect()
    )


def _run_feed(spark, base, fault_injector=None):
    landing, state = os.path.join(base, "landing"), os.path.join(base, "state")
    feed = os.path.join(base, "feed")
    changes = _changes_df(spark)
    parts = [changes.filter(f"seq > {i * 2} and seq <= {(i + 1) * 2}") for i in range(3)]
    _land_ordered(parts, landing)
    cdc.init_snapshot(_target(spark), state)
    cdc.stream_apply_changes(
        spark, landing, changes.schema, state, "k", ["seq"], "op",
        checkpoint_dir=os.path.join(base, "ckpt"),
        fault_injector=fault_injector, feed_dir=feed,
    )
    return state, feed


def test_change_feed_emits_per_batch_net_diffs(spark):
    base = os.path.join(tempfile.gettempdir(), f"cdcf_{uuidlib.uuid4().hex[:8]}")
    state, feed = _run_feed(spark, base)
    got = _feed_rows(cdc.read_change_feed(spark, feed))
    # batch 0 (seq 1-2): update 1 -> a1/11, delete 2
    # batch 1 (seq 3-4): insert 6, update 1 -> a2/12
    # batch 2 (seq 5-6): resurrect 2 (insert), delete 6
    assert got == [
        (0, 1, "U", "a", "a1", 10.0, 11.0),
        (0, 2, "D", "b", None, 20.0, None),
        (1, 1, "U", "a1", "a2", 11.0, 12.0),
        (1, 6, "I", None, "f", None, 60.0),
        (2, 2, "I", None, "b2", None, 25.0),
        (2, 6, "D", "f", None, 60.0, None),
    ]


def test_change_feed_folds_to_the_total_diff(spark):
    """Applying the feed rows in batch order onto the initial snapshot
    reproduces the final snapshot — the feed IS a replayable CDC log."""
    base = os.path.join(tempfile.gettempdir(), f"cdcf_{uuidlib.uuid4().hex[:8]}")
    state, feed = _run_feed(spark, base)
    as_log = cdc.read_change_feed(spark, feed).selectExpr(
        "k",
        "coalesce(name_new, name_old) AS name",
        "coalesce(bal_new, bal_old) AS bal",
        "CASE WHEN op = 'D' THEN 'D' ELSE 'U' END AS op",
        "CAST(batch AS LONG) AS seq",
    )
    replayed = merge_changes(_target(spark), as_log, "k", ["seq"], "op")
    assert _rows(replayed) == _rows(cdc.current_snapshot(spark, state))


def test_change_feed_version_range_prunes_partitions(spark):
    base = os.path.join(tempfile.gettempdir(), f"cdcf_{uuidlib.uuid4().hex[:8]}")
    state, feed = _run_feed(spark, base)
    rng = cdc.read_change_feed(spark, feed, from_version=1, to_version=1)
    assert sorted(r["k"] for r in rng.collect()) == [1, 6]
    plan = rng._jdf.queryExecution().executedPlan().toString()
    # the commit-range bound must reach the scan as a partition filter,
    # not a post-scan Filter over the whole feed
    assert "PartitionFilters" in plan and "batch" in plan.split("PartitionFilters")[1][:200], plan


def test_change_feed_replay_after_pre_swap_crash_is_idempotent(spark):
    """A crash AFTER the feed write but BEFORE the pointer swap replays
    the batch: the feed partition is overwritten with identical content
    — no duplicate feed rows."""
    base = os.path.join(tempfile.gettempdir(), f"cdcf_{uuidlib.uuid4().hex[:8]}")

    boom = {"armed": True}

    def inject(batch_id, phase):
        if phase == "pre_swap" and batch_id == 1 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected pre-swap crash")

    with pytest.raises(Exception, match="injected|Query"):
        _run_feed(spark, base, fault_injector=inject)
    # restart: same landing/checkpoint/state — batch 1 replays
    landing, state = os.path.join(base, "landing"), os.path.join(base, "state")
    feed = os.path.join(base, "feed")
    cdc.stream_apply_changes(
        spark, landing, _changes_df(spark).schema, state, "k", ["seq"], "op",
        checkpoint_dir=os.path.join(base, "ckpt"), feed_dir=feed,
    )
    got = _feed_rows(cdc.read_change_feed(spark, feed))
    # full-tuple compare (ADVICE r16): a replay that duplicated or
    # corrupted the *_old/*_new value columns in the rewritten batch=1
    # partition must fail here, not just a batch/key/op drift
    assert got == [
        (0, 1, "U", "a", "a1", 10.0, 11.0),
        (0, 2, "D", "b", None, 20.0, None),
        (1, 1, "U", "a1", "a2", 11.0, 12.0),
        (1, 6, "I", None, "f", None, 60.0),
        (2, 2, "I", None, "b2", None, 25.0),
        (2, 6, "D", "f", None, 60.0, None),
    ]


def test_read_change_feed_missing_dir(spark):
    """ADVICE r16: a stream that ran zero micro-batches never creates
    feed_dir — the reader must not crash with a raw path-not-found."""
    import pytest

    import shutil

    missing = os.path.join(
        tempfile.gettempdir(), f"cdcf_none_{uuidlib.uuid4().hex[:8]}"
    )
    with pytest.raises(FileNotFoundError, match="batch"):
        cdc.read_change_feed(spark, missing)
    empty = cdc.read_change_feed(
        spark, missing, empty_schema="k long, op string, batch int"
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["k", "op", "batch"]
    # an existing-but-batchless dir behaves the same
    os.makedirs(missing, exist_ok=True)
    with pytest.raises(FileNotFoundError, match="batch"):
        cdc.read_change_feed(spark, missing)
    shutil.rmtree(missing)


# -------------------------------------------- streaming MV consumer

_MV_FEED_SCHEMA = (
    "k long, op string, grp_old string, grp_new string, "
    "v_old long, v_new long"
)


def _mv_feed_fixture(spark, base):
    """Two feed partitions + a bootstrapped MV state dir."""
    from pyspark.sql import functions as F

    from lawlm_spark.operators.relational import distributive_state

    feed = os.path.join(base, "feed")
    rows0 = spark.createDataFrame(
        [(1, "I", None, "a", None, 10), (2, "I", None, "b", None, 7)],
        _MV_FEED_SCHEMA,
    )
    rows1 = spark.createDataFrame(
        [(1, "U", "a", "b", 10, 12), (2, "D", "b", None, 7, None)],
        _MV_FEED_SCHEMA,
    )
    rows0.write.parquet(os.path.join(feed, "batch=0"))
    rows1.write.parquet(os.path.join(feed, "batch=1"))
    mv = os.path.join(base, "mv")
    init = spark.createDataFrame(
        [(9, "a", 100)], "k long, grp string, v long"
    )
    cdc.init_snapshot(
        distributive_state(init, {"grp": F.col("grp")}, F.col("v")), mv
    )
    return feed, mv


def _mv_rows(spark, mv):
    return sorted(
        (r["grp"], r["m_cnt"], r["m_sum"])
        for r in cdc.current_snapshot(spark, mv).collect()
    )


def _run_mv(spark, feed, mv, base, **kw):
    from pyspark.sql import functions as F

    return cdc.stream_fold_mv(
        spark, feed, _MV_FEED_SCHEMA, mv,
        {"grp": F.col("grp_old")}, {"grp": F.col("grp_new")},
        F.col("v_old"), F.col("v_new"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        **kw,
    )


def test_stream_fold_mv_converges(spark):
    # init a:(1,100); b0: +a10, +b7; b1: a->b migration (-10,+12), -b7
    # => a:(1,100)  b: {12} -> (1,12)
    base = os.path.join(tempfile.gettempdir(), f"mv_{uuidlib.uuid4().hex[:8]}")
    feed, mv = _mv_feed_fixture(spark, base)
    _run_mv(spark, feed, mv, base)
    assert _mv_rows(spark, mv) == [("a", 1, 100), ("b", 1, 12)]


def test_stream_fold_mv_chunking_free(spark):
    """The delta algebra is commutative/associative: folding file-by-
    file (a feed partition split across micro-batches) converges to the
    same state — no sequencing contract, unlike the snapshot apply."""
    base = os.path.join(tempfile.gettempdir(), f"mvc_{uuidlib.uuid4().hex[:8]}")
    feed, mv = _mv_feed_fixture(spark, base)
    _run_mv(spark, feed, mv, base, max_files_per_trigger=1)
    one_by_one = _mv_rows(spark, mv)

    base2 = os.path.join(tempfile.gettempdir(), f"mvc_{uuidlib.uuid4().hex[:8]}")
    feed2, mv2 = _mv_feed_fixture(spark, base2)
    _run_mv(spark, feed2, mv2, base2, max_files_per_trigger=100)
    assert _mv_rows(spark, mv2) == one_by_one


def test_stream_fold_mv_restart_after_crash_converges(spark, monkeypatch):
    """Pre-swap crash window: the replay recomputes the fold from the
    intact previous version — no double-count."""
    base = os.path.join(tempfile.gettempdir(), f"mvx_{uuidlib.uuid4().hex[:8]}")
    feed, mv = _mv_feed_fixture(spark, base)

    real_swap = cdc._swap_pointer
    calls = {"n": 0}

    def crashing_swap(spark_, state_dir, version):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash before mv pointer swap")
        real_swap(spark_, state_dir, version)

    monkeypatch.setattr(cdc, "_swap_pointer", crashing_swap)
    with pytest.raises(Exception, match="injected crash"):
        _run_mv(spark, feed, mv, base)
    monkeypatch.setattr(cdc, "_swap_pointer", real_swap)
    _run_mv(spark, feed, mv, base)
    assert _mv_rows(spark, mv) == [("a", 1, 100), ("b", 1, 12)]


def test_stream_fold_mv_unbootstrapped_raises(spark):
    base = os.path.join(tempfile.gettempdir(), f"mvu_{uuidlib.uuid4().hex[:8]}")
    feed, _ = _mv_feed_fixture(spark, base)
    with pytest.raises(Exception, match="not bootstrapped"):
        _run_mv(spark, feed, os.path.join(base, "mv_nope"), base)


def test_stream_fold_mv_default_checkpoint_crash_rerun_converges(
    spark, monkeypatch
):
    """ADVICE r17: a crash followed by a BARE rerun (default
    checkpoint_dir) must converge.  The default now derives from the
    durable mv_dir (`<mv_dir>/_ckpt`), so the rerun resumes the
    crashed run's stream checkpoint; a per-run random default would
    restart batch ids at 0 against the already-advanced pointer and
    re-fold already-applied feed files — counts inflate POSITIVELY,
    invisible to the negative-count integrity guard.  The crash is
    injected post-swap of batch 1 (the window where fresh-checkpoint
    batch ids misalign with the pointer on replay)."""
    from pyspark.sql import functions as F

    base = os.path.join(tempfile.gettempdir(), f"mvd_{uuidlib.uuid4().hex[:8]}")
    feed, mv = _mv_feed_fixture(spark, base)

    real_prune = cdc._prune_versions

    def crashing_prune(spark_, state_dir, keep):
        real_prune(spark_, state_dir, keep)
        if keep[0] == "v1":  # batch 1 swapped, checkpoint NOT committed
            raise RuntimeError("injected crash after mv pointer swap")

    def run_default():
        return cdc.stream_fold_mv(
            spark, feed, _MV_FEED_SCHEMA, mv,
            {"grp": F.col("grp_old")}, {"grp": F.col("grp_new")},
            F.col("v_old"), F.col("v_new"),
        )

    monkeypatch.setattr(cdc, "_prune_versions", crashing_prune)
    with pytest.raises(Exception, match="injected crash"):
        run_default()
    monkeypatch.setattr(cdc, "_prune_versions", real_prune)
    run_default()
    assert _mv_rows(spark, mv) == [("a", 1, 100), ("b", 1, 12)]


def test_cdc_state_layer_remote_style_uri(spark):
    """VERDICT r17 item 2: the whole pointer/retention control plane
    routes through the Hadoop FileSystem API, so a URI state_dir
    (file:// here — the same JVM code path hdfs:// and s3a:// take,
    vs the former os.path short-circuit) behaves identically to a
    plain local path end-to-end: bootstrap, stream apply with the
    default in-state-dir checkpoint, pointer read, version listing,
    time travel, retention."""
    base = os.path.join(tempfile.gettempdir(), f"cdcu_{uuidlib.uuid4().hex[:8]}")
    landing = os.path.join(base, "landing")
    state = "file://" + os.path.join(base, "state")
    changes = _changes_df(spark)
    parts = [changes.filter("seq <= 3"), changes.filter("seq > 3")]
    _land_ordered(parts, landing)
    cdc.init_snapshot(_target(spark), state)
    cdc.stream_apply_changes(
        spark, landing, changes.schema, state, "k", ["seq"], "op",
    )
    got = _rows(cdc.current_snapshot(spark, state))
    want = _rows(merge_changes(_target(spark), changes, "k", ["seq"], "op"))
    assert got == want
    versions = cdc.list_versions(spark, state)
    assert versions[-1] == cdc._read_pointer(spark, state)
    assert len(versions) <= 2
    assert _rows(cdc.read_version(spark, state, versions[-1])) == want
    with pytest.raises(FileNotFoundError, match="not retained"):
        cdc.read_version(spark, state, "v999")


def test_read_change_feed_reraises_unrelated_analysis_error():
    """ADVICE r17: only PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA mean
    "no feed".  Any OTHER AnalysisException from the read (corrupt or
    conflicting schema metadata in a real, non-empty feed) must
    re-raise — even when empty_schema is passed — instead of being
    misreported as a quiet interval."""
    from pyspark.errors import AnalysisException

    class _Reader:
        def parquet(self, path):
            raise AnalysisException("conflicting schema metadata")

    class _FakeSpark:
        read = _Reader()

        def createDataFrame(self, *a, **k):
            raise AssertionError("must not swallow into an empty frame")

    with pytest.raises(AnalysisException, match="conflicting"):
        cdc.read_change_feed(_FakeSpark(), "/nope/feed", empty_schema="k long")


# -------------------------------------------- feed retention/compaction


def _mv_key_args():
    from pyspark.sql import functions as F

    return (
        {"grp": F.col("grp_old")},
        {"grp": F.col("grp_new")},
        F.col("v_old"),
        F.col("v_new"),
    )


def _compact_fixture(spark, base):
    """The _mv_feed_fixture feed + a bootstrapped compaction base dir
    holding the initial distributive_state."""
    from pyspark.sql import functions as F

    from lawlm_spark.operators.relational import distributive_state

    feed, _mv = _mv_feed_fixture(spark, base)
    init = spark.createDataFrame(
        [(9, "a", 100)], "k long, grp string, v long"
    )
    cbase = os.path.join(base, "cbase")
    cdc.init_snapshot(
        distributive_state(init, {"grp": F.col("grp")}, F.col("v")), cbase
    )
    return feed, cbase


def _compacted_rows(spark, cbase, feed):
    return sorted(
        (r["grp"], r["m_cnt"], r["m_sum"])
        for r in cdc.read_compacted_state(
            spark, cbase, feed, *_mv_key_args(),
            feed_schema=_MV_FEED_SCHEMA,
        ).collect()
    )


def test_compact_change_feed_fold_equivalence(spark):
    """The compaction identity: fold(compacted base, remaining feed)
    == fold(initial, FULL feed) — batch 0 folded into the base and
    expired, batch 1 still live."""
    base = os.path.join(tempfile.gettempdir(), f"cp_{uuidlib.uuid4().hex[:8]}")
    feed, cbase = _compact_fixture(spark, base)
    deleted = cdc.compact_change_feed(
        spark, feed, cbase, 0, *_mv_key_args()
    )
    assert deleted == 1
    assert cdc.compacted_through(spark, cbase) == 0
    # batch=0 expired on disk, batch=1 retained
    left = sorted(os.listdir(os.path.join(base, "feed")))
    assert "batch=0" not in left and "batch=1" in left
    # same final MV as the uncompacted fold (test_stream_fold_mv value)
    assert _compacted_rows(spark, cbase, feed) == [
        ("a", 1, 100), ("b", 1, 12)
    ]


def test_compact_change_feed_full_horizon_and_idempotent(spark):
    """Compacting through the LAST commit leaves an empty feed (typed
    empty frame via feed_schema) and the base alone carries the exact
    MV; re-running the same compaction is a no-op."""
    base = os.path.join(tempfile.gettempdir(), f"cpf_{uuidlib.uuid4().hex[:8]}")
    feed, cbase = _compact_fixture(spark, base)
    assert cdc.compact_change_feed(spark, feed, cbase, 1, *_mv_key_args()) == 2
    assert _compacted_rows(spark, cbase, feed) == [
        ("a", 1, 100), ("b", 1, 12)
    ]
    # idempotent re-run: nothing left to fold or delete
    assert cdc.compact_change_feed(spark, feed, cbase, 1, *_mv_key_args()) == 0
    assert _compacted_rows(spark, cbase, feed) == [
        ("a", 1, 100), ("b", 1, 12)
    ]


def test_compact_change_feed_incremental_horizons(spark):
    """Two successive compactions (through 0, then through 1) fold
    only the (watermark, horizon] delta each time and converge to the
    full-horizon result."""
    base = os.path.join(tempfile.gettempdir(), f"cpi_{uuidlib.uuid4().hex[:8]}")
    feed, cbase = _compact_fixture(spark, base)
    cdc.compact_change_feed(spark, feed, cbase, 0, *_mv_key_args())
    cdc.compact_change_feed(spark, feed, cbase, 1, *_mv_key_args())
    assert cdc.compacted_through(spark, cbase) == 1
    assert _compacted_rows(spark, cbase, feed) == [
        ("a", 1, 100), ("b", 1, 12)
    ]


@pytest.mark.parametrize(
    "phase", ["pre_base_swap", "post_base_swap", "post_watermark"]
)
def test_compact_change_feed_crash_replay_converges(spark, phase):
    """All three crash windows: a rerun after a crash at any step
    converges to the same state with no double-fold (the base-pointer
    guard) and no premature deletion (expiry keys off the WATERMARK,
    which only advances after the base swap)."""
    base = os.path.join(
        tempfile.gettempdir(), f"cpc_{phase}_{uuidlib.uuid4().hex[:8]}"
    )
    feed, cbase = _compact_fixture(spark, base)

    def crash(horizon, at):
        if at == phase:
            raise RuntimeError(f"injected crash at {at}")

    with pytest.raises(RuntimeError, match="injected crash"):
        cdc.compact_change_feed(
            spark, feed, cbase, 0, *_mv_key_args(), fault_injector=crash
        )
    # before the watermark advances, nothing may be deleted
    if phase in ("pre_base_swap", "post_base_swap"):
        assert "batch=0" in os.listdir(os.path.join(base, "feed"))
    cdc.compact_change_feed(spark, feed, cbase, 0, *_mv_key_args())
    assert cdc.compacted_through(spark, cbase) == 0
    assert "batch=0" not in os.listdir(os.path.join(base, "feed"))
    assert _compacted_rows(spark, cbase, feed) == [
        ("a", 1, 100), ("b", 1, 12)
    ]


def test_compact_change_feed_unbootstrapped_raises(spark):
    base = os.path.join(tempfile.gettempdir(), f"cpu_{uuidlib.uuid4().hex[:8]}")
    feed, _cbase = _compact_fixture(spark, base)
    with pytest.raises(RuntimeError, match="not bootstrapped"):
        cdc.compact_change_feed(
            spark, feed, os.path.join(base, "nope"), 0, *_mv_key_args()
        )
    with pytest.raises(ValueError, match="horizon"):
        cdc.compact_change_feed(spark, feed, base, -1, *_mv_key_args())


def test_compact_change_feed_smaller_horizon_retains_folded_batches(spark):
    """r18 self-review fix: a compaction called with a horizon BELOW
    an earlier compaction's watermark must not delete the
    already-folded batches past the requested horizon (they stay
    retained for audit reads) — expiry is bounded by min(horizon,
    watermark), never the watermark alone."""
    base = os.path.join(tempfile.gettempdir(), f"cph_{uuidlib.uuid4().hex[:8]}")
    feed, cbase = _compact_fixture(spark, base)
    # fold BOTH batches but ask expiry only through 0: batch=1 is
    # folded (watermark 1) yet past the ask — it must survive
    cdc.compact_change_feed(spark, feed, cbase, 1, *_mv_key_args())
    assert cdc.compacted_through(spark, cbase) == 1
    # rebuild just the feed partition the full-horizon call expired
    # is not needed: use a fresh fixture folded to watermark 1 with a
    # smaller-horizon second call
    base2 = os.path.join(tempfile.gettempdir(), f"cph2_{uuidlib.uuid4().hex[:8]}")
    feed2, cbase2 = _compact_fixture(spark, base2)
    cdc.compact_change_feed(spark, feed2, cbase2, 0, *_mv_key_args())
    # manually advance the fold past the retained batch WITHOUT expiry
    # by compacting horizon=1 under a crash injected post-watermark
    # (fold + watermark land, the expiry never runs)
    def crash(h, at):
        if at == "post_watermark" and h == 1:
            raise RuntimeError("stop before expiry")

    with pytest.raises(RuntimeError, match="stop before expiry"):
        cdc.compact_change_feed(
            spark, feed2, cbase2, 1, *_mv_key_args(), fault_injector=crash
        )
    assert cdc.compacted_through(spark, cbase2) == 1
    assert "batch=1" in os.listdir(os.path.join(base2, "feed"))
    # the smaller-horizon call: watermark is 1, ask is 0 — batch=1 is
    # folded but past the ask and must NOT be deleted
    deleted = cdc.compact_change_feed(spark, feed2, cbase2, 0, *_mv_key_args())
    assert deleted == 0
    assert "batch=1" in os.listdir(os.path.join(base2, "feed"))


def test_compact_change_feed_empty_feed_noop_with_schema(spark):
    """r18 self-review fix: compacting PAST a fully-expired feed (an
    earlier full-horizon compaction removed every partition, nothing
    landed since) is a clean no-op fold when feed_schema is passed —
    the watermark advances, nothing is deleted, the consumer identity
    holds; without feed_schema the read raises the documented
    descriptive error."""
    base = os.path.join(tempfile.gettempdir(), f"cpe_{uuidlib.uuid4().hex[:8]}")
    feed, cbase = _compact_fixture(spark, base)
    cdc.compact_change_feed(spark, feed, cbase, 1, *_mv_key_args())
    assert os.listdir(os.path.join(base, "feed")) == []
    with pytest.raises(FileNotFoundError, match="batch"):
        cdc.compact_change_feed(spark, feed, cbase, 5, *_mv_key_args())
    deleted = cdc.compact_change_feed(
        spark, feed, cbase, 5, *_mv_key_args(),
        feed_schema=_MV_FEED_SCHEMA,
    )
    assert deleted == 0
    assert cdc.compacted_through(spark, cbase) == 5
    assert _compacted_rows(spark, cbase, feed) == [
        ("a", 1, 100), ("b", 1, 12)
    ]
