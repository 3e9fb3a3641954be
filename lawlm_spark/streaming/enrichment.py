"""Broadcast-state stream enrichment — the Flink broadcast-state
pattern (VERDICT r9's second surface candidate): a keyed DATA stream
enriched against REFERENCE updates that arrive on a stream, held in
per-key state and applied in event-time order.  Batch as-of joins
(operators/asof.py) need both sides complete; here the reference is a
live stream and each data event must see exactly the latest reference
update strictly before it (lexicographic (ts_us, event_id) order, so
ties are deterministic on both engines).

API note — transformWithState is GATED in this container, the
semantics are NOT.  Spark 4.x's typed-state API
(`GroupedData.transformWithStateInPandas` + `StatefulProcessor`) is
the native binding for this pattern, and PySpark 4.1.2 ships it, but
its Python state-server protocol imports `google.protobuf`, which is
absent here and cannot be installed (reproduced:
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError: cannot
import name 'descriptor' from 'google.protobuf' — NOTES_r10).  Same
environment-gate class as pypdf/qdrant/sentence-transformers.  The
implementation below expresses identical semantics on
`applyInPandasWithState` (ValueState of the latest reference per key);
switching to a `StatefulProcessor` when protobuf exists is a
mechanical rebinding of `_enrich_fn`.

Scale shape: ONE stateful exchange on the key (plan-asserted in
tests/test_enrichment.py); per-key state is a constant-size tuple
(latest reference), so state growth is O(distinct keys) regardless of
stream length; the per-batch Python work is a single sorted pass over
the key's rows.  At 100 TB the landing build shards by key across
executors exactly like the v41 path (NOTES_r09 §5 floor analysis).
"""

from __future__ import annotations

import os
import tempfile
import uuid as uuidlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lawlm_spark.streaming.landing import write_mtime_pinned_parts

# output of the enrichment operator: every DATA (purchase) event with
# the multiplier that was live at its event time and the enriched value
OUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, cents long, "
    "mult_applied long, enriched_cents long"
)
# per-key state: the latest reference update seen so far
STATE_SCHEMA = "ts_us long, mult long"
DEFAULT_MULT = 1


def _enrich_fn(key, pdfs, state):
    """One key's micro-batch: fold rows in (ts_us, event_id) order —
    'U' rows replace the state multiplier, 'D' rows emit enriched with
    the multiplier live at that point.  Cross-batch order is the
    landing contract (time-split parts, mtime-pinned), so the sorted
    within-batch pass composes to exact global as-of semantics.

    The within-batch fold is vectorized (VERDICT r10 polish note): the
    multiplier live at each row is the latest 'U' val at an earlier
    sorted position, i.e. a forward-fill of U vals seeded by the
    incoming state — no per-row Python loop.  The cross-batch state
    handoff (one tuple per key) is unchanged."""
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    cur_ts, cur_mult = state.getOption or (-1, DEFAULT_MULT)
    is_u = (rows["kind"] == "U").to_numpy()
    vals = rows["val"].to_numpy()
    # forward-fill of U vals as an exact int64 GATHER (not a pandas
    # ffill, which would round-trip through float64 and corrupt
    # multipliers above 2^53 — r11 review): latest U position at or
    # before each row, then index back into vals.  For a D row
    # "at or before" = "strictly before" (the row itself is not U),
    # matching the sequential fold.
    u_pos = np.where(is_u, np.arange(len(is_u)), -1)
    latest_u = np.maximum.accumulate(u_pos) if len(u_pos) else u_pos
    live = np.where(
        latest_u >= 0,
        vals[np.maximum(latest_u, 0)],
        cur_mult,
    ).astype("int64")
    if is_u.any():
        last_u = int(np.flatnonzero(is_u)[-1])
        cur_ts = int(rows["ts_us"].to_numpy()[last_u])
        cur_mult = int(vals[last_u])
    state.update((cur_ts, cur_mult))
    d_mask = ~is_u
    if d_mask.any():
        cents = vals[d_mask].astype("int64")
        mult = live[d_mask]
        enriched = cents * mult
        # numpy int64 multiply WRAPS on overflow where the old per-row
        # Python fold failed loudly at Arrow conversion (r11 review) —
        # restore loudness with an exact vectorized check: a wrapped
        # product no longer divides back to the multiplier
        nz = cents != 0
        if not np.array_equal(enriched[nz] // cents[nz], mult[nz]):
            raise OverflowError(
                "enriched_cents overflows int64 for at least one row "
                f"(key={int(key[0])}); cents * mult must fit the "
                "declared long output schema"
            )
        yield pd.DataFrame(
            {
                "user_id": np.full(cents.shape, int(key[0]), dtype="int64"),
                "event_id": rows["event_id"].to_numpy()[d_mask].astype("int64"),
                "ts_us": rows["ts_us"].to_numpy()[d_mask].astype("int64"),
                "cents": cents,
                "mult_applied": mult,
                "enriched_cents": enriched,
            }
        )


def stateful_enrichment(stream):
    """stream: (user_id, event_id, ts_us, kind 'U'|'D', val) —
    'U' carries a multiplier, 'D' carries cents.  Returns the enriched
    'D' stream (OUT_SCHEMA)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _enrich_fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def build_enrichment_landing(spark, sf_dir: str):
    """Tagged union landing from the events table: signups become
    reference updates ('U', mult = pmod(round(value), 9) + 2 in 2..10
    — pmod, not %, so the invariant holds even for negative values;
    ADVICE r10), purchases become data events ('D', cents).  Two time-split parts
    with mtime-pinned order (the v41 landing contract; ties at the
    split share a batch because the split predicate uses ts only, so
    the composite (ts_us, event_id) order is never cut mid-tie).
    Returns the landing dir."""
    from lawlm_spark.streaming.events import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = normalize_event_time(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    )
    tagged = ev.filter(
        F.col("event_type").isin("signup", "purchase")
    ).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "signup", F.lit("U"))
        .otherwise(F.lit("D"))
        .alias("kind"),
        F.when(
            F.col("event_type") == "signup",
            F.pmod(F.round(F.col("value")).cast("long"), F.lit(9)) + 2,
        )
        .otherwise(F.round(F.col("value") * 100).cast("long"))
        .alias("val"),
    )
    med = tagged.agg(
        F.percentile_approx("ts_us", 0.5).cast("long").alias("med")
    ).first()["med"]
    if med is None:
        # empty tagged stream: int(None) below would raise an opaque
        # TypeError (r10 review finding) — name the real problem
        raise ValueError(
            f"no signup/purchase rows in {sf_dir}/events.parquet — "
            "nothing to enrich"
        )
    split_us = int(med)
    landing = os.path.join(
        tempfile.gettempdir(), f"v72_{uuidlib.uuid4().hex[:8]}"
    )
    write_mtime_pinned_parts(
        landing,
        [
            tagged.filter(F.col("ts_us") <= split_us),
            tagged.filter(F.col("ts_us") > split_us),
        ],
    )
    return landing


def run_v72_query(spark, landing: str):
    """Query phase: two mtime-ordered micro-batches through the
    stateful enrichment into a memory sink.  Same Arrow local override
    as run_v41_query (the session's 1024 is tuned for the chunker;
    this path wants large batches), same try/finally restore."""
    _ARROW = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(_ARROW, None)
    spark.conf.set(_ARROW, "100000")
    sink = f"v72_sink_{uuidlib.uuid4().hex[:8]}"
    try:
        schema = spark.read.parquet(
            os.path.join(landing, "part0.parquet")
        ).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(landing)
        )
        q = (
            stateful_enrichment(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option(
                "checkpointLocation",
                os.path.join(tempfile.gettempdir(), f"ckpt_{sink}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old is None:
            spark.conf.unset(_ARROW)
        else:
            spark.conf.set(_ARROW, old)
    return spark.table(sink)
