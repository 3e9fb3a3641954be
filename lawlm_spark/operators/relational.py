"""Relational / incremental-state operators (SURVEY.md §2.1, §2.3).

The reference's incremental-ingest machinery is imperative driver-side
Python: a full vector-store scroll building an in-memory id set
(reference: data-ingestion/qdrant_manager.py:67-90), a membership test
per docket (data_extraction.py:110-123), and a (dead — bug B1) cursor
resume (qdrant_manager.py:92-106).  Each becomes one declarative Spark
op whose physical plan Catalyst already does right:

  O4  coalesce_with_provenance — F.coalesce + CASE provenance
      (data_extraction.py:174-180, config.yml:26-34)
  O21 distinct_keys            — distinct over the mirror (partial agg,
      one shuffle on the key)
  O22 anti_join_new            — broadcast left-anti equi-join; the
      distinct-keys side is small -> broadcast hint, no full shuffle
      of the incoming side
  O23 latest_by                — deterministic max-by via row_number
      (fixes reference bug B1: resume cursor was always None)
  O24 dup_audit                — groupBy(key).count > 1 (hash agg)
  O25 run_counters             — one-pass global aggregate

Scale notes: at 100 TB, O21/O24 shuffle once on the key; O22 stays a
broadcast join as long as the processed-key set fits the broadcast
threshold (distinct docket ids, not rows — millions of keys ≈ tens of
MB), degrading gracefully to a shuffled anti-join via AQE beyond that.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def coalesce_with_provenance(
    fields: Sequence[tuple[str, Column]],
    value_name: str = "text",
    provenance_name: str = "source_field",
) -> dict[str, Column]:
    """O4: first-non-null over ordered (name, column) candidates, plus a
    provenance column recording which candidate won.

    Reference semantics (data_extraction.py:174-180): iterate
    citation_types in config order, take the first non-empty field.
    Empty string counts as missing, like the reference's falsy check.
    """
    non_empty = [
        (name, F.when(F.length(F.trim(col)) > 0, col)) for name, col in fields
    ]
    value = F.coalesce(*[c for _, c in non_empty])
    prov = F.lit(None).cast("string")
    for name, col in reversed(non_empty):
        prov = F.when(col.isNotNull(), F.lit(name)).otherwise(prov)
    return {value_name: value, provenance_name: prov}


def distinct_keys(mirror: DataFrame, key_col: str) -> DataFrame:
    """O21: the processed-key state scan (qdrant_manager.py:67-90)."""
    return mirror.select(key_col).distinct()


def anti_join_new(incoming: DataFrame, processed: DataFrame, key_col: str) -> DataFrame:
    """O22: keep only rows whose key is NOT in `processed`.

    The engine's core incremental-ingest join (data_extraction.py:110-123).
    `processed` is the small distinct-key side -> broadcast left-anti.
    """
    return incoming.join(
        broadcast(processed.select(key_col).distinct()), key_col, "left_anti"
    )


def latest_by(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """O23: per group, the single row with max(order_col) — deterministic
    via explicit tiebreak columns (desc), unlike bare max_by.

    Fixes reference bug B1 (qdrant_manager.py:92-106 parsed the wrong
    field/format, so resume never worked).

    SCALE NOTE: with empty group_cols the window funnels every row into
    one partition.  For an ungrouped max-by of a few columns use
    `agg(max(struct(order_col, ...)))` instead (associative, map-side
    partials) — see plans/ingest_api.resume_cursor.
    """
    order = [F.col(order_col).desc(), *[F.col(c).desc() for c in tiebreak]]
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(*order)
    else:
        w = Window.orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def dup_audit(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """O24: duplicate-key groups (reference tests/test_duplicates.py:95-117).

    Empty result == the chunk-key uniqueness invariant holds.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def run_counters(df: DataFrame, counters: dict[str, Column]) -> DataFrame:
    """O25: run-level totals in one pass (data_extraction.py:336-443's
    running counters, as a single global aggregate)."""
    return df.agg(*[c.alias(name) for name, c in counters.items()])


def observed(df: DataFrame, observation, metrics: dict[str, Column]) -> DataFrame:
    """O25 streaming-safe variant: attach observe() metrics that are
    collected as a side effect of whatever action runs downstream — no
    second pass over the data (unlike run_counters).  `observation` is a
    pyspark.sql.Observation (batch) or a string name (streaming; read the
    values from the StreamingQueryListener/progress events)."""
    return df.observe(observation, *[c.alias(name) for name, c in metrics.items()])


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change log:
    (key, attr, valid_from, valid_to, is_current) — one row per ATTR
    TRANSITION, valid over [valid_from, valid_to), open-ended for the
    current value.  The standard CDC-stream -> dimension-table pattern:
    consecutive rows with an unchanged attribute collapse into one
    validity interval.

    Deterministic under ties via `order_cols` (pass the event id).
    Two windows over the SAME (key, ts, *order) partitioning/sort —
    one Exchange, one sort at any scale; nothing quadratic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(attr_col).over(w)
    changes = (
        df.select(key_col, ts_col, attr_col, *order_cols)
        .withColumn("_chg", prev.isNull() | ~F.col(attr_col).eqNullSafe(prev))
        .filter("_chg")
    )
    nxt = F.lead(ts_col).over(w)
    return changes.select(
        key_col,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_apply_increment(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental Type-2 dimension maintenance: fold a NEW batch of
    change-log rows into an existing scd2_intervals table WITHOUT
    recomputing history — the nightly-dimension-load pattern (the batch
    twin of the v82 MV fold; VERDICT r16's CDC arc).

    Algorithm: keys untouched by the batch pass through unchanged (a
    broadcast anti join — no exchange, no window).  For affected keys,
    the CLOSED intervals also pass through; only each key's OPEN row is
    re-seeded as a pseudo-change at its valid_from and re-run through
    scd2_intervals together with the batch rows — so the open interval
    extends (batch's first attr equals the open attr: no transition) or
    closes (attr changed: valid_to = the first new transition), and the
    remaining transitions append.  New keys build from scratch.

    Exactness contract (the v83 oracle identity): incremental fold ==
    scd2_intervals over the concatenated log, PROVIDED the batch is
    append-only per key — every batch ts strictly after the key's last
    seen ts.  (The seed row orders before same-key batch rows because
    valid_from <= the old log's max ts < every batch ts; its order
    columns are NULL, which sort first under Spark's ASC default.)
    A PARTIAL runtime guard enforces the detectable half (r17 review):
    a batch row at ts <= its key's open-row valid_from (the last
    TRANSITION ts) raises instead of silently corrupting history.
    Rows landing inside the open interval after a later unchanged
    event are undetectable from the dimension alone — the dimension
    does not retain non-transition timestamps — and remain the
    caller's contract.

    Scale shape: the dimension is never window-scanned — it is filtered
    through two broadcast joins on the (small) batch key set; the only
    exchange is the scd2 window over seed ∪ batch, sized by the BATCH,
    not the history.  At 100 TB the nightly fold shuffles one day of
    changes while the archive streams through untouched.
    """
    keys = batch.select(key_col).distinct()
    untouched = dim.join(broadcast(keys), key_col, "left_anti")
    affected = dim.join(broadcast(keys), key_col, "semi")
    closed = affected.filter(~F.col("is_current"))
    order_types = {f.name: f.dataType for f in batch.schema.fields}
    seed = affected.filter(F.col("is_current")).select(
        key_col,
        F.col("valid_from").alias(ts_col),
        F.col(attr_col),
        *[
            F.lit(None).cast(order_types[c]).alias(c)
            for c in order_cols
        ],
    )
    # partial append-only guard: a batch row at or before its key's
    # last transition is definitely out of order — raise, don't corrupt
    seed_ts = seed.select(key_col, F.col(ts_col).alias("_seed_ts"))
    checked_batch = (
        batch.select(key_col, ts_col, attr_col, *order_cols)
        .join(broadcast(seed_ts), key_col, "left")
        .filter(
            F.when(
                F.col("_seed_ts").isNull()
                | (F.col(ts_col) > F.col("_seed_ts")),
                F.lit(True),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "scd2_apply_increment: batch row at or before "
                        "its key's last transition ts — the batch "
                        "violates the append-only contract (replayed "
                        "or out-of-order change log?)"
                    )
                ).cast("boolean")
            )
        )
        .drop("_seed_ts")
    )
    merged = seed.unionByName(checked_batch)
    rebuilt = scd2_intervals(merged, key_col, ts_col, attr_col, order_cols)
    return untouched.unionByName(closed).unionByName(rebuilt)


def merge_changes(
    target: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """MERGE INTO semantics over a CDC change log: apply the LATEST
    change per key (by `seq_cols`, descending) to `target` — 'U'/'I'
    upsert the change's payload (update if the key exists, insert if
    not), 'D' deletes the key; keys without changes pass through
    untouched.  The lakehouse upsert the reference's Qdrant point-id
    overwrite approximates (data_extraction.py:279-317), generalized
    with delete tombstones.

    `changes` must carry `target`'s full schema plus `op_col` and
    `seq_cols`.  Re-applying an already-applied change set is a no-op
    (latest-op-wins is idempotent), which is what makes the streaming
    wrapper (streaming/cdc.py) replay-safe.

    Scale: one shuffle keys the latest-change window (over the change
    log only, usually tiny next to the target); the apply join is a
    single equi-join on the key — broadcast-able when the batch is
    small, and prunable to touched partitions when the target is
    partitioned by key range.
    """
    payload = [c for c in target.columns if c != key_col]
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key_col),
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(f"_c_{c}") for c in payload],
        )
    )
    joined = target.join(latest, key_col, "full_outer")
    return (
        joined.filter(F.col("_op").isNull() | (F.col("_op") != F.lit("D")))
        .select(
            key_col,
            *[
                F.when(F.col("_op").isNull(), F.col(c))
                .otherwise(F.col(f"_c_{c}"))
                .alias(c)
                for c in payload
            ],
        )
    )


def agg_state(
    df: DataFrame, keys: list[str], value_col: Column, measures_prefix: str = "m"
) -> DataFrame:
    """(keys..., {p}_cnt, {p}_sum, {p}_min, {p}_max): the mergeable
    aggregate state of an incrementally-maintained rollup (materialized
    view delta maintenance — the batch counterpart of v36's streaming
    running totals).

    The state is a plain keyed table: persist it, then fold each new
    batch in with `merge_agg_states` instead of rescanning history —
    at 100 TB the nightly increment touches one day, not the archive.
    Every measure here is algebraic (count/sum/min/max merge
    associatively; avg derives as sum/cnt at READ time — storing avg
    would make the state unmergeable).  Use integer measure units
    (epoch micros, milli-values) per the repo-wide cross-engine
    convention: integer sums are shuffle-order-proof, double sums are
    not.
    """
    p = measures_prefix
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(f"{p}_cnt"),
        F.sum(value_col).alias(f"{p}_sum"),
        F.min(value_col).alias(f"{p}_min"),
        F.max(value_col).alias(f"{p}_max"),
    )


def merge_agg_states(
    a: DataFrame, b: DataFrame, keys: list[str], measures_prefix: str = "m"
) -> DataFrame:
    """Fold two aggregate states: one keyed aggregate over the union —
    merge(state(A), state(B)) == state(A ⊎ B) exactly (test-pinned),
    the property that makes per-batch states composable artifacts."""
    p = measures_prefix
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum(f"{p}_cnt").alias(f"{p}_cnt"),
            F.sum(f"{p}_sum").alias(f"{p}_sum"),
            F.min(f"{p}_min").alias(f"{p}_min"),
            F.max(f"{p}_max").alias(f"{p}_max"),
        )
    )


def distributive_state(
    df: DataFrame,
    key_exprs: dict[str, Column],
    value_col: Column,
    measures_prefix: str = "m",
) -> DataFrame:
    """(keys..., {p}_cnt, {p}_sum): the DELETION-MAINTAINABLE subset of
    agg_state — count and sum fold under inserts, updates, AND deletes
    (fold_change_feed), which min/max cannot (removing the current min
    needs a rescan).  avg derives as sum/cnt at read time.  Keys are
    arbitrary expressions over the row (e.g. a value bucket), so a view
    can group by attributes that CHANGE — the fold handles the group
    migration.  Integer value units per the repo-wide convention."""
    p = measures_prefix
    return df.groupBy(
        *[e.alias(k) for k, e in key_exprs.items()]
    ).agg(
        F.count(F.lit(1)).alias(f"{p}_cnt"),
        F.sum(value_col).alias(f"{p}_sum"),
    )


def fold_change_feed(
    state: DataFrame,
    feed: DataFrame,
    key_exprs_old: dict[str, Column],
    key_exprs_new: dict[str, Column],
    value_old: Column,
    value_new: Column,
    op_col: str = "op",
    measures_prefix: str = "m",
) -> DataFrame:
    """Incremental materialized-view maintenance over a change data
    feed (VERDICT r16 item 4b — the consumer half of the CDC arc):
    fold one batch (or any version range) of streaming/cdc.py::
    read_change_feed rows into a distributive_state WITHOUT rescanning
    the snapshot.  The classic IVM delta algebra for distributive
    aggregates:

        D/U rows retract (key_old, cnt -1, sum -value_old)
        I/U rows insert  (key_new, cnt +1, sum +value_new)

    An update contributes BOTH — which makes group-key migration (a
    row whose changed attributes move it between view groups) exact by
    construction.  Groups whose count folds to zero leave the view.

    Exactness: fold(state(S), feed(S -> S')) == distributive_state(S')
    row-for-row (the oracle identity the v82 entry certifies) — counts
    and integer sums are shuffle-order-proof.

    Scale shape: each feed row explodes into <= 2 delta rows map-side
    (one scan, no self-join), then state ∪ deltas runs ONE keyed
    aggregate.  The exchange is over state ∪ delta; co-locate repeated
    folds by bucketing the stored state on the view keys so only the
    (small) delta side moves.  At 100 TB the nightly fold touches one
    day's feed partitions (read_change_feed prunes on `batch`), never
    the archive."""
    p = measures_prefix
    keys = list(key_exprs_old)
    if keys != list(key_exprs_new):
        raise ValueError(
            f"key name mismatch: {keys} vs {list(key_exprs_new)}"
        )
    op = F.col(op_col)
    rem = F.when(
        op.isin("D", "U"),
        F.struct(
            *[e.alias(k) for k, e in key_exprs_old.items()],
            F.lit(-1).cast("long").alias(f"{p}_cnt"),
            (-value_old).cast("long").alias(f"{p}_sum"),
        ),
    )
    add = F.when(
        op.isin("I", "U"),
        F.struct(
            *[e.alias(k) for k, e in key_exprs_new.items()],
            F.lit(1).cast("long").alias(f"{p}_cnt"),
            value_new.cast("long").alias(f"{p}_sum"),
        ),
    )
    deltas = (
        feed.select(F.explode(F.array(rem, add)).alias("_d"))
        .filter(F.col("_d").isNotNull())
        .select("_d.*")
    )
    folded = state.unionByName(deltas).groupBy(*keys).agg(
        F.sum(f"{p}_cnt").alias(f"{p}_cnt"),
        F.sum(f"{p}_sum").alias(f"{p}_sum"),
    )
    # a count folding NEGATIVE (more retractions than rows) or to ZERO
    # with a nonzero residual sum (a retraction carried the wrong
    # value) means the feed did not come from this state — integrity
    # error, not a droppable group; fail loudly instead of silently
    # losing the key or its measure mass (r16 ADVICE + r17 review)
    cnt, tot = F.col(f"{p}_cnt"), F.col(f"{p}_sum")
    return folded.filter(
        F.when((cnt > 0) | ((cnt == 0) & (tot == 0)), cnt > 0).otherwise(
            F.raise_error(
                F.lit(
                    "fold_change_feed: a group folded to a negative "
                    "count or an emptied group kept a nonzero sum — "
                    "the feed batch does not correspond to this state "
                    "(double-applied, missing, or corrupt batches?)"
                )
            ).cast("boolean")
        )
    )


def enrich_changes(
    changes: DataFrame,
    dim: DataFrame,
    dim_key_expr: Column,
    dim_key_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Re-enrich a CDC batch against a broadcast dimension — the join
    half of incremental view maintenance (the v82 fold covers the
    aggregate half): map a fact-side change batch into the change
    batch of the ENRICHED view by joining I/U rows to `dim` on the
    row's NEW derived key, so an update whose derived key MIGRATED
    (e.g. a balance update moving a customer between tiers) picks up
    the new dimension attributes; D rows pass through with NULL
    enrichment (merge_changes deletes by key, the payload is unread).
    Output = `changes`' columns + `dim`'s non-key columns, feedable
    straight into merge_changes / stream_apply_changes — so the
    enriched snapshot stays fresh under CDC without EVER re-joining
    the snapshot to the dimension: each batch's work is
    feed x broadcast(dim).

    A change key absent from `dim` enriches to NULL (left join) — the
    contract a slowly-growing dimension needs; validate dim
    completeness upstream if NULLs are errors.  At 100 TB the classic
    deployment: dim is the broadcast-sized lookup, `changes` is one
    commit's feed partition, and the merge prunes to touched key
    ranges."""
    dim_payload = [c for c in dim.columns if c != dim_key_col]
    clash = [c for c in dim_payload if c in changes.columns]
    if clash:
        raise ValueError(
            f"dim payload columns collide with change columns: {clash}"
        )
    if "_dk" in changes.columns or "_dk" in dim.columns:
        raise ValueError(
            "'_dk' is reserved by enrich_changes for the derived join key"
        )
    enriched = (
        changes.withColumn("_dk", dim_key_expr)
        .join(
            broadcast(dim.withColumnRenamed(dim_key_col, "_dk")),
            "_dk",
            "left",
        )
        .drop("_dk")
    )
    return enriched.select(
        *changes.columns,
        *[
            F.when(F.col(op_col) != "D", F.col(c)).alias(c)
            for c in dim_payload
        ],
    )


def temporal_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Each fact row + the SCD2 dimension version valid AT THE FACT'S
    TIMESTAMP (valid_from <= t < valid_to; the open current row matches
    everything from its valid_from on) — the point-in-time dimension
    lookup every star-schema fact load runs against a Type-2 dimension
    (scd2_intervals builds one from a change log).

    Plan shape: an equi-join on the key carrying the interval predicate
    as a join-side filter — the SCD2 intervals of one key are disjoint,
    so each fact matches AT MOST one version (no fanout; asserted in
    test_relational.py).  Per-key version counts are small by nature
    (attribute change history), so the join is linear and AQE broadcasts
    a small dimension whole.
    """
    d = dim.select(
        F.col(key_col).alias("_dk"),
        F.col(valid_from_col).alias("_vf"),
        F.col(valid_to_col).alias("_vt"),
        *[c for c in dim.columns if c not in (key_col, valid_from_col, valid_to_col)],
    )
    t = F.col(fact_ts_col)
    cond = (
        (facts[key_col] == F.col("_dk"))
        & (t >= F.col("_vf"))
        & (F.col("_vt").isNull() | (t < F.col("_vt")))
    )
    return (
        facts.join(d, cond, how)
        .drop("_dk")
        .withColumnRenamed("_vf", valid_from_col)
        .withColumnRenamed("_vt", valid_to_col)
    )
