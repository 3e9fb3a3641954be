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

The actual Qdrant network upsert (foreachPartition with a qdrant-client)
is gated behind an import-try since the client isn't in this container;
the mirror IS the sink contract the rest of the engine relies on.
"""

from __future__ import annotations

import os

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
