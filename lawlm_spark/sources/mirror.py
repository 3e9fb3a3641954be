"""Index mirror: the engine's parquet "silver" table of everything
upserted to the vector store (O6/O7/O8/O10, SURVEY.md §2.1).

The reference's vector store is the only persistent state; reading it
back means a paginated scroll (reference:
data-ingestion/qdrant_manager.py:72-104).  The engine instead keeps a
parquet mirror written in the same job as the upsert, so every state
scan (existing keys, duplicate audits, stats, resume cursor) is a plain
columnar table scan with pushdown — no network scroll.

  write_mirror — idempotent overwrite-by-run sink.  Partitioned by a
      low-cardinality run/court column when given: at 100 TB partition
      pruning turns incremental-state scans into reads of the newest
      partitions only.
  scan_mirror  — the O6 scroll replacement.
  bootstrap    — O8 DDL parity: mirror dir exists iff collection exists.
  stats        — O10 collection counters in one aggregate pass.
  compact      — small-file maintenance for append-heavy mirrors
      (streaming ingest writes one file set per micro-batch).

The actual Qdrant network upsert (foreachPartition with a qdrant-client)
is gated behind an import-try since the client isn't in this container;
the mirror IS the sink contract the rest of the engine relies on.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_mirror(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """O7 (mirror half): persist the index table as parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_mirrors(writes: Sequence[tuple[DataFrame, str]]) -> None:
    """Write several independent mirror tables CONCURRENTLY (r18).

    Spark's scheduler happily runs jobs from multiple driver threads;
    actions submitted sequentially leave the cluster idle through each
    write's task tail (guide §2.6).  The ingest pipeline's two outputs
    (chunks, postings) share no dependency — submitting both from a
    small thread pool lets the second job back-fill executors freed by
    the first's stragglers.  Each (df, path) pair gets the standard
    write_mirror overwrite semantics; exceptions propagate — the first
    failure IN SUBMISSION ORDER is raised (futures are drained in
    order, so a later-submitted write's failure surfaces only after the
    earlier futures complete; ADVICE r18)."""
    from concurrent.futures import ThreadPoolExecutor

    if not writes:
        return
    with ThreadPoolExecutor(max_workers=min(len(writes), 4)) as pool:
        futures = [pool.submit(write_mirror, df, path) for df, path in writes]
        for f in futures:
            f.result()


def write_mirror_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """O7 mirror, bucketed: saveAsTable with bucketBy so downstream
    equi-joins/aggregations on `bucket_col` read co-located buckets and
    skip the shuffle entirely (both sides bucketed => no Exchange in the
    join plan).  This is the 100 TB layout for the chunk index: bucket by
    doc/docket id, sort within buckets by the range-pruned columns
    (SURVEY §7 phase 4: sorted by (court, date_filed))."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale location from a previous session would fail the save
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    stale = os.path.join(warehouse, table.lower())
    if os.path.isdir(stale):
        import shutil

        shutil.rmtree(stale, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def scan_mirror(spark: SparkSession, path: str) -> DataFrame:
    """O6: full-state scan (replaces the reference's paginated scroll)."""
    return spark.read.parquet(path)


def mirror_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of a mirror directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_mirror(
    spark: SparkSession, path: str, target_bytes: int = 128 << 20
) -> int:
    """Rewrite a mirror into ~target_bytes data files; returns new count.

    Streaming ingest (streaming/ingest.py) appends one file set per
    micro-batch, so a long-lived mirror accretes thousands of small
    files and every state scan goes metadata-bound (footer reads
    dominate; at 100 TB with object storage, LIST + per-file GET is the
    bottleneck, not bytes).  Compaction reads the mirror, coalesces to
    ceil(bytes / target) splits — coalesce, not repartition: merging
    read splits is a narrow dependency, no shuffle — and swaps the
    directory.  The swap is last so a crash mid-compact leaves the
    original intact; on a real deployment compaction runs through the
    table format's transaction log (Iceberg/Delta rewrite-data-files)
    instead of a directory rename, which object stores can't do
    atomically.
    """
    import math
    import shutil

    _n_before, total = mirror_file_stats(path)
    n_files = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + ".compact-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, _ = mirror_file_stats(path)
    return n_after


def mirror_exists(path: str) -> bool:
    """O8: does the 'collection' exist (parquet dir with a _SUCCESS/footer)."""
    return os.path.isdir(path) and any(
        f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(path)
    )


def mirror_stats(mirror: DataFrame, key_col: str = "point_id") -> DataFrame:
    """O10: collection stats — points/vectors/distinct keys in one pass
    (reference app.py:384-405's points_count / vectors_count)."""
    return mirror.agg(
        F.count("*").alias("points_count"),
        F.count(key_col).alias("vectors_count"),
        F.countDistinct(key_col).alias("distinct_keys"),
    )


def upsert_qdrant(df: DataFrame, collection: str, url: str) -> None:  # pragma: no cover
    """O7 (network half): bulk upsert via foreachPartition.

    Deterministic uuid5 point ids make task retries idempotent
    (SURVEY.md §4).  Gated: qdrant-client is not in this container.
    """
    try:
        import qdrant_client  # noqa: F401, PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "qdrant-client not installed; the parquet mirror is the sink "
            "in this environment"
        ) from e
    raise NotImplementedError("network sink wiring is deployment-specific")


def write_mirror_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Hive-partitioned mirror layout: directory-per-value on the given
    columns, so any query filtering on them PRUNES whole directories at
    planning time (PartitionFilters in the scan — zero bytes read from
    skipped partitions).  The 100 TB complement to bucketing: bucket the
    high-cardinality join key, PARTITION the low-cardinality slice keys
    (language, source, date) every curation/mix query filters on.
    Low-cardinality is load-bearing — partitioning a high-cardinality
    key would explode the file count (one dir per value)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def scan_mirror_pruned(spark: SparkSession, path: str, **equals) -> DataFrame:
    """Read a partitioned mirror with equality filters on partition
    columns — expressed as regular .filter()s so Catalyst turns them
    into PartitionFilters (plan-asserted in test_mirror_lifecycle.py)."""
    df = spark.read.parquet(path)
    for col, val in equals.items():
        df = df.filter(F.col(col) == val)
    return df
