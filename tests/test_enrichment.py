"""streaming/enrichment.py: broadcast-state stream enrichment."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from lawlm_spark.streaming.enrichment import (
    run_v72_query,
    stateful_enrichment,
)
from lawlm_spark.streaming.landing import write_mtime_pinned_parts

T0 = 1_609_459_200_000_000  # 2021-01-01 00:00:00 UTC, epoch micros
MIN = 60_000_000

SCHEMA = "user_id long, event_id long, ts_us long, kind string, val long"


def _land(landing: str, parts: list) -> None:
    """One parquet file per part, increasing mtime — the shared writer
    IS the contract under test."""
    write_mtime_pinned_parts(landing, parts)


def _rows(df):
    return sorted(
        (r["user_id"], r["event_id"], r["mult_applied"], r["enriched_cents"])
        for r in df.collect()
    )


def test_enrichment_semantics_and_default(spark):
    """Data before any reference gets the default multiplier; each data
    event sees exactly the latest reference strictly before it; a
    reference at the same ts applies iff its event_id is smaller
    (lexicographic (ts_us, event_id) order)."""
    base = tempfile.mkdtemp(prefix="v72_sem_")
    landing = os.path.join(base, "landing")
    rows = [
        (1, 1, T0, "D", 100),             # before any U -> mult 1
        (1, 2, T0 + MIN, "U", 3),
        (1, 3, T0 + 2 * MIN, "D", 100),   # -> 3
        (1, 4, T0 + 3 * MIN, "U", 5),
        (1, 5, T0 + 3 * MIN, "D", 100),   # same ts, U has smaller id -> 5
        (1, 7, T0 + 4 * MIN, "D", 100),   # U id 8 at same ts is LATER -> 5
        (1, 8, T0 + 4 * MIN, "U", 9),
        (2, 6, T0, "D", 100),             # other key isolated -> 1
    ]
    _land(landing, [spark.createDataFrame(rows, SCHEMA)])
    got = _rows(run_v72_query(spark, landing))
    assert got == [
        (1, 1, 1, 100),
        (1, 3, 3, 300),
        (1, 5, 5, 500),
        (1, 7, 5, 500),
        (2, 6, 1, 100),
    ]


def test_exact_int64_multiplier_above_2_53(spark):
    """The vectorized fold must gather U vals as int64, never
    round-trip through float64 (r11 review): a multiplier above 2^53
    applies exactly.  The operator's state schema declares `mult long`
    — the full range is the contract, even though the v72 builder
    bounds it to 2..10."""
    base = tempfile.mkdtemp(prefix="v72_big_")
    landing = os.path.join(base, "landing")
    big = 9_007_199_254_740_993  # 2**53 + 1, not representable in f64
    rows = [
        (1, 1, T0, "U", big),
        (1, 2, T0 + MIN, "D", 1),
    ]
    _land(landing, [spark.createDataFrame(rows, SCHEMA)])
    got = _rows(run_v72_query(spark, landing))
    assert got == [(1, 2, big, big)]


def test_state_carries_across_micro_batches(spark):
    """The reference set in batch 0 must enrich data arriving in batch 1
    (the whole point of keyed state); batch 1's own update then takes
    over within the same batch."""
    base = tempfile.mkdtemp(prefix="v72_xbatch_")
    landing = os.path.join(base, "landing")
    f0 = spark.createDataFrame(
        [(1, 1, T0, "U", 7), (1, 2, T0 + MIN, "D", 10)], SCHEMA
    )
    f1 = spark.createDataFrame(
        [
            (1, 3, T0 + 10 * MIN, "D", 10),   # enriched by batch-0 state
            (1, 4, T0 + 11 * MIN, "U", 2),
            (1, 5, T0 + 12 * MIN, "D", 10),
        ],
        SCHEMA,
    )
    _land(landing, [f0, f1])
    got = _rows(run_v72_query(spark, landing))
    assert got == [(1, 2, 7, 70), (1, 3, 7, 70), (1, 5, 2, 20)]


def test_int64_overflow_fails_loudly(spark):
    """numpy's int64 multiply wraps silently; the fold must detect the
    wrap and raise (the old per-row Python fold failed loudly at Arrow
    conversion — r11 review) rather than emit a wrong negative
    enriched_cents."""
    import pytest

    base = tempfile.mkdtemp(prefix="v72_ovf_")
    landing = os.path.join(base, "landing")
    rows = [
        (1, 1, T0, "U", 2**53),
        (1, 2, T0 + MIN, "D", 2048),  # 2^53 * 2^11 = 2^64 > int64
    ]
    _land(landing, [spark.createDataFrame(rows, SCHEMA)])
    with pytest.raises(Exception, match="overflows int64"):
        run_v72_query(spark, landing)


def test_randomized_differential_vs_python_fold(spark):
    """Seeded randomized differential (r11 hardening): random U/D
    interleavings with DELIBERATE ts ties across 32 users, split into
    three micro-batches on ts thresholds (ties never straddle a split
    — the landing contract), must equal a pure-Python sequential fold
    over the globally (ts_us, event_id)-sorted stream.  Pins the
    vectorized gather + cross-batch state handoff end to end."""
    import random

    rng = random.Random(0x72D1FF)
    rows = []
    eid = 0
    for u in range(32):
        for _ in range(rng.randint(1, 30)):
            eid += 1
            ts = T0 + rng.randint(0, 20) * MIN  # small range -> many ties
            if rng.random() < 0.3:
                rows.append((u, eid, ts, "U", rng.randint(2, 10)))
            else:
                rows.append((u, eid, ts, "D", rng.randint(1, 1000)))
    # pure-Python reference: per-user sequential fold in global order
    want = []
    state = {}
    for u, e, ts, kind, val in sorted(rows, key=lambda r: (r[2], r[1])):
        if kind == "U":
            state[u] = val
        else:
            m = state.get(u, 1)
            want.append((u, e, m, val * m))
    # three time-split batches; thresholds on ts ONLY so ties share a batch
    t1, t2 = T0 + 7 * MIN, T0 + 14 * MIN
    base = tempfile.mkdtemp(prefix="v72_rand_")
    landing = os.path.join(base, "landing")
    parts = [
        spark.createDataFrame([r for r in rows if r[2] <= t1], SCHEMA),
        spark.createDataFrame([r for r in rows if t1 < r[2] <= t2], SCHEMA),
        spark.createDataFrame([r for r in rows if r[2] > t2], SCHEMA),
    ]
    _land(landing, parts)
    got = _rows(run_v72_query(spark, landing))
    assert got == sorted(want)


def _make_sink(out_dir, kill_marker, kill_batch):
    def _sink(df, batch_id: int) -> None:
        if (
            kill_marker is not None
            and batch_id == kill_batch
            and not os.path.exists(kill_marker)
        ):
            open(kill_marker, "w").close()
            raise RuntimeError("injected kill")
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"b{batch_id}"))

    return _sink


def _run_foreach(spark, landing, ckpt, out_dir, kill_marker=None,
                 kill_batch=None, ttl_us=None):
    """Shared crash-test drive for BOTH operator forms (one recipe —
    the production module was deduplicated for exactly this drift
    mode): ttl_us=None runs the plain operator, an int adds the
    watermark and runs the TTL variant."""
    from lawlm_spark.streaming.enrichment import stateful_enrichment_ttl

    schema = spark.read.parquet(os.path.join(landing, "part0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(landing)
    )
    if ttl_us is None:
        enriched = stateful_enrichment(stream)
    else:
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        ).withWatermark("ts", "0 seconds")
        enriched = stateful_enrichment_ttl(stream, ttl_us)
    q = (
        enriched
        .writeStream.foreachBatch(_make_sink(out_dir, kill_marker, kill_batch))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _sink_rows(spark, out_dir):
    dfs = [
        spark.read.parquet(os.path.join(out_dir, d))
        for d in sorted(os.listdir(out_dir))
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return sorted(
        (r["user_id"], r["event_id"], r["mult_applied"], r["enriched_cents"])
        for r in out.collect()
    )


def test_reference_state_survives_kill_restart(spark):
    """The kill lands in batch 1, AFTER batch 0 installed u1's
    multiplier into state: the restart must replay batch 1 against the
    RESTORED state — a lost reference silently falls back to the
    default multiplier and changes values (not just counts), which is
    exactly what the multiset compare catches."""
    base = tempfile.mkdtemp(prefix="v72_crash_")
    landing = os.path.join(base, "landing")
    f0 = spark.createDataFrame([(1, 1, T0, "U", 7)], SCHEMA)
    f1 = spark.createDataFrame(
        [(1, 2, T0 + MIN, "D", 10), (2, 3, T0 + MIN, "D", 10)], SCHEMA
    )
    _land(landing, [f0, f1])
    expected = [(1, 2, 7, 70), (2, 3, 1, 10)]

    ref_out = os.path.join(base, "ref_out")
    _run_foreach(spark, landing, os.path.join(base, "ref_ckpt"), ref_out)
    assert _sink_rows(spark, ref_out) == expected

    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    marker = os.path.join(base, "killed")
    with pytest.raises(Exception, match="injected kill"):
        _run_foreach(spark, landing, ckpt, out, marker, kill_batch=1)
    assert os.path.exists(marker)
    _run_foreach(spark, landing, ckpt, out, marker, kill_batch=1)
    assert _sink_rows(spark, out) == expected


def test_single_stateful_exchange_plan(spark):
    """One hashpartitioning exchange on the key feeding the
    FlatMapGroupsInPandasWithState operator — the same shape contract
    as v41's plan test (test_stateful.py); NoTimeout (no watermark
    machinery needed: the operator never expires reference state)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(
            (F.col("value") % 3).alias("user_id"),
            F.col("value").alias("event_id"),
            (F.col("value") * 1_000_000).alias("ts_us"),
            F.when(F.col("value") % 5 == 0, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("kind"),
            (F.col("value") % 7 + 1).alias("val"),
        )
    )
    sdf = stateful_enrichment(stream)
    plan = sdf._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "FlatMapGroupsInPandasWithState" in plan
    assert "NoTimeout" in plan
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(ex) == 1 and "hashpartitioning(user_id" in ex[0], plan
    assert "REQUIRED_BY_STATEFUL_OPERATOR" in ex[0]


# ---------------------------------------------------------------------------
# TTL variant (VERDICT r11 item 3): event-time staleness rule +
# result-neutral EventTimeTimeout state eviction

def _run_ttl(spark, landing, ttl_us, progress_out=None):
    from lawlm_spark.streaming.enrichment import run_v72_ttl_query

    return run_v72_ttl_query(spark, landing, ttl_us, progress_out)


def test_ttl_staleness_boundary(spark):
    """mult applies iff d.ts - u.ts < ttl (STRICT — the boundary must
    match the eviction rounding so GC can never precede staleness):
    diff = ttl-1 applies, diff = ttl reads DEFAULT_MULT."""
    base = tempfile.mkdtemp(prefix="v74_bnd_")
    landing = os.path.join(base, "landing")
    ttl = 10 * MIN
    rows = [
        (1, 1, T0, "U", 7),
        (1, 2, T0 + ttl - 1, "D", 100),  # strictly inside -> 7
        (1, 3, T0 + ttl, "D", 100),      # at the horizon -> default 1
        (2, 4, T0, "D", 100),            # never any U -> default 1
    ]
    _land(landing, [spark.createDataFrame(rows, SCHEMA)])
    got = _rows(_run_ttl(spark, landing, ttl))
    assert got == [(1, 2, 7, 700), (1, 3, 1, 100), (2, 4, 1, 100)]


def test_ttl_idle_key_reseeds_default_and_state_evicted(spark):
    """The VERDICT-named behavior: a key idle past the horizon re-seeds
    from DEFAULT_MULT, and its state row is GONE from the store (read
    via stateOperators.numRowsTotal), not just semantically ignored.
    Key 2 stays active (a fresh U each window) and keeps both its
    multiplier and its state row."""
    base = tempfile.mkdtemp(prefix="v74_evict_")
    landing = os.path.join(base, "landing")
    ttl = 10 * MIN
    b0 = spark.createDataFrame(
        [
            (1, 1, T0, "U", 7),
            (1, 2, T0 + MIN, "D", 10),   # fresh -> 7
            (2, 3, T0, "U", 5),
        ],
        SCHEMA,
    )
    # watermark after b1 = T0 + 40 MIN >> key 1's expiry (T0 + ttl);
    # key 2's reference is refreshed inside the window
    b1 = spark.createDataFrame(
        [
            (2, 4, T0 + 9 * MIN, "U", 5),
            (-1, 5, T0 + 40 * MIN, "D", 1),  # sentinel advances watermark
        ],
        SCHEMA,
    )
    # b2: key 1 (no data since b0, timed out after b1's watermark) gets
    # a late-window D -> re-seeds DEFAULT; key 2 refreshes its
    # reference INSIDE the current window (a reference merely fresh at
    # its own event's time but stale at the watermark is GC'd on the
    # data path — result-neutral) and its D 1 us later reads it
    b2 = spark.createDataFrame(
        [
            (1, 6, T0 + 41 * MIN, "D", 10),
            (2, 7, T0 + 40 * MIN, "U", 5),
            (2, 8, T0 + 40 * MIN + 1, "D", 10),
        ],
        SCHEMA,
    )
    _land(landing, [b0, b1, b2])
    progress = []
    got = _rows(_run_ttl(spark, landing, ttl, progress))
    assert got == [
        (-1, 5, 1, 1),
        (1, 2, 7, 70),
        (1, 6, 1, 10),   # re-seeded from DEFAULT_MULT after eviction
        (2, 8, 5, 50),
    ]
    # state rows after the final batch: key 2 only (its expiry T0+50MIN
    # is ahead of the final watermark T0+41MIN; key 1 evicted by
    # timeout, sentinel key -1 and re-seeded key 1 carry no reference
    # so the fold never parks state for them)
    totals = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progress
        if p.get("stateOperators")
    ]
    assert totals and totals[-1] == 1, totals


def test_ttl_matches_plain_when_horizon_huge(spark):
    """With ttl far beyond the data's time range the TTL variant must
    reproduce the plain operator's output exactly (same landing)."""
    import random

    rng = random.Random(0x74AA)
    rows = []
    eid = 0
    for u in range(8):
        for _ in range(rng.randint(2, 12)):
            eid += 1
            ts = T0 + rng.randint(0, 20) * MIN
            if rng.random() < 0.35:
                rows.append((u, eid, ts, "U", rng.randint(2, 10)))
            else:
                rows.append((u, eid, ts, "D", rng.randint(1, 1000)))
    t1 = T0 + 10 * MIN
    base = tempfile.mkdtemp(prefix="v74_eq_")
    landing = os.path.join(base, "landing")
    _land(landing, [
        spark.createDataFrame([r for r in rows if r[2] <= t1], SCHEMA),
        spark.createDataFrame([r for r in rows if r[2] > t1], SCHEMA),
    ])
    plain = _rows(run_v72_query(spark, landing))
    ttl = _rows(_run_ttl(spark, landing, 10**15))
    assert ttl == plain


def test_ttl_single_stateful_exchange_plan(spark):
    """Same one-exchange shape as the NoTimeout plan test, with
    EventTimeTimeout + watermark in place."""
    from lawlm_spark.streaming.enrichment import stateful_enrichment_ttl

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .select(
            (F.col("value") % 3).alias("user_id"),
            F.col("value").alias("event_id"),
            (F.col("value") * 1_000_000).alias("ts_us"),
            F.when(F.col("value") % 5 == 0, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("kind"),
            (F.col("value") % 7 + 1).alias("val"),
        )
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "0 seconds")
    )
    sdf = stateful_enrichment_ttl(stream, 60_000_000)
    plan = sdf._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "FlatMapGroupsInPandasWithState" in plan
    assert "EventTimeTimeout" in plan
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(ex) == 1 and "hashpartitioning(user_id" in ex[0], plan


def test_ttl_randomized_differential_vs_python_fold(spark):
    """Seeded randomized differential for the TTL variant (mirrors the
    plain fold's r11 test): random U/D interleavings with ts ties
    across 32 users, three time-split micro-batches, must equal a
    pure-Python sequential fold applying the staleness rule — mult
    applies iff d.ts - u.ts < ttl, else DEFAULT_MULT.  Pins the
    vectorized staleness gather, the eviction boundary AND the
    cross-batch handoff end to end (evictions must never change
    results — any divergence here would catch a GC that outran the
    event-time rule)."""
    import random

    rng = random.Random(0x74D1FF)
    ttl = 5 * MIN
    rows = []
    eid = 0
    for u in range(32):
        for _ in range(rng.randint(1, 30)):
            eid += 1
            ts = T0 + rng.randint(0, 20) * MIN
            if rng.random() < 0.3:
                rows.append((u, eid, ts, "U", rng.randint(2, 10)))
            else:
                rows.append((u, eid, ts, "D", rng.randint(1, 1000)))
    want = []
    state = {}  # user -> (ref_ts, mult)
    for u, e, ts, kind, val in sorted(rows, key=lambda r: (r[2], r[1])):
        if kind == "U":
            state[u] = (ts, val)
        else:
            ref_ts, m = state.get(u, (None, 1))
            if ref_ts is None or ts - ref_ts >= ttl:
                m = 1
            want.append((u, e, m, val * m))
    t1, t2 = T0 + 7 * MIN, T0 + 14 * MIN
    base = tempfile.mkdtemp(prefix="v74_rand_")
    landing = os.path.join(base, "landing")
    _land(landing, [
        spark.createDataFrame([r for r in rows if r[2] <= t1], SCHEMA),
        spark.createDataFrame([r for r in rows if t1 < r[2] <= t2], SCHEMA),
        spark.createDataFrame([r for r in rows if r[2] > t2], SCHEMA),
    ])
    got = _rows(_run_ttl(spark, landing, ttl))
    assert got == sorted(want)


def test_ttl_state_survives_kill_restart(spark):
    """Crash coverage for the TTL variant (the plain operator has its
    own; the TTL path additionally checkpoints WATERMARK + TIMEOUT
    registrations).  The kill lands in batch 1, AFTER batch 0 installed
    key 1's reference: the REPLAYED batch 1 carries a within-horizon D
    for key 1 whose expected multiplier (7, not DEFAULT) is readable
    ONLY from restored state — a restore that lost the state row emits
    (1,9,1,10) and fails the multiset compare (r12 third review: the
    first version's replayed rows were all state-insensitive and would
    have passed even with state wiped).  Batch 1's sentinel then pushes
    the watermark past key 1's expiry, so batch 2's late-window D must
    re-seed from DEFAULT_MULT (restored staleness behavior), while key
    2 — fresh in batch 2 — keeps multiplier 5.  Eviction observability
    lives in test_ttl_idle_key_reseeds_default_and_state_evicted
    (numRowsTotal); this test pins the restart contract."""
    base = tempfile.mkdtemp(prefix="v74_crash_")
    landing = os.path.join(base, "landing")
    ttl = 10 * MIN
    f0 = spark.createDataFrame(
        [(1, 1, T0, "U", 7), (1, 2, T0 + MIN, "D", 10)], SCHEMA
    )
    f1 = spark.createDataFrame(
        [
            (1, 9, T0 + 2 * MIN, "D", 10),    # within horizon: needs state
            (-1, 3, T0 + 40 * MIN, "D", 1),   # watermark sentinel
        ],
        SCHEMA,
    )
    f2 = spark.createDataFrame(
        [
            (1, 4, T0 + 41 * MIN, "D", 10),       # stale ref -> default
            (2, 5, T0 + 41 * MIN, "U", 5),
            (2, 6, T0 + 41 * MIN + 1, "D", 10),   # fresh -> 5
        ],
        SCHEMA,
    )
    _land(landing, [f0, f1, f2])
    expected = [
        (-1, 3, 1, 1),
        (1, 2, 7, 70),
        (1, 4, 1, 10),
        (1, 9, 7, 70),   # the state-discriminating row
        (2, 6, 5, 50),
    ]

    ref_out = os.path.join(base, "ref_out")
    _run_foreach(spark, landing, os.path.join(base, "ref_ckpt"), ref_out,
                 ttl_us=ttl)
    assert _sink_rows(spark, ref_out) == expected

    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    marker = os.path.join(base, "killed")
    with pytest.raises(Exception, match="injected kill"):
        _run_foreach(spark, landing, ckpt, out, marker, kill_batch=1,
                     ttl_us=ttl)
    assert os.path.exists(marker)
    _run_foreach(spark, landing, ckpt, out, marker, kill_batch=1, ttl_us=ttl)
    assert _sink_rows(spark, out) == expected
