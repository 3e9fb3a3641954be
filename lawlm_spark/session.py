"""SparkSession factory.

Local mode mirrors the driver environment (local[$SPARK_GRAFT_CPUS],
single JVM); the conf choices are the ones that matter on a real
multi-executor cluster too:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- auto broadcast threshold left at default so small dims broadcast
- Arrow enabled for every pandas-UDF boundary
- shuffle partitions sized to the core count (AQE coalesces down);
  at 100 TB you would raise this to ~2-3x total cores and rely on
  AQE + spark.sql.adaptive.advisoryPartitionSizeInBytes
- session timezone pinned to UTC so timestamp semantics are stable
  across the DuckDB oracle, parquet readers and streaming windows
- streaming state store stays on the DEFAULT HDFS-backed provider:
  the r10 A/B (tools/profile_stateful.py --providers, NOTES_r10) had
  RocksDB ~18% SLOWER on the v41 stateful path at this state size
  (1500 keys: in-heap maps are cheap; RocksDB pays 2-3x commitTimeMs
  for native snapshot/changelog upkeep).  At 100 TB, when per-executor
  state outgrows the heap, flip ONE conf —
  spark.sql.streaming.stateStore.providerClass =
  ...state.RocksDBStateStoreProvider — the swap is correctness-
  certified (all 9 streaming registry entries selfcheck green under
  RocksDB at sf0.01, identical values; NOTES_r10).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "lawlm-spark",
    *,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r18 re-measure: the r2-era 1024 (tuned when chunker rows were
        # assumed wide) costs extra Python-worker roundtrips on every
        # pandas boundary; at Spark's default 10000 the pandas-UDF
        # benches read equal-or-faster (b_ingest_recursive 2.37->1.91 s,
        # b_nfa_pattern 4.00->3.59 s, b_semdedup 3.67->3.34 s mins,
        # interleaved) including the chunker path itself.  65536
        # measured no further gain.  v41 keeps its local 100k override.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # events.parquet carries TIMESTAMP(NANOS), which Spark cannot read
        # natively (PARQUET_TYPE_ILLEGAL); read as long, convert in the
        # source layer (sources/testdata.py) so views expose a real
        # timestamp matching the DuckDB oracle's microsecond TIMESTAMP.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # managed tables (bucketed mirrors) land in tmp, not the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/lawlm_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _silence_bounded_window_warnings(spark)
    return spark


def _silence_bounded_window_warnings(spark: SparkSession) -> None:
    """Raise WindowExec's log level to ERROR (VERDICT r6 item 5).

    Every unpartitioned window in this engine runs over an
    already-bounded relation (post-limit rank stamps, ≤n_bins sketch
    registers), yet each one emits "No Partition Defined for Window
    operation!" — dozens of lines that drown the bench tail.  A
    constant partition key CANNOT fix this on Spark 4: the
    EliminateWindowPartitions optimizer rule (SPARK-46941) strips
    foldable partition expressions, so the physical spec is empty again
    and the warning returns (verified empirically with lit(1),
    when/otherwise, and arithmetic-identity keys).  Filtering this one
    logger is the remaining lever; the guard against a REAL
    unpartitioned window sneaking in moves to tests/
    test_window_hygiene.py, which fails on any `Window.orderBy` /
    bare `Window.partitionBy()` site not on the documented
    bounded-relation allowlist — a stronger, review-forcing check than
    a log line in a bench tail.

    Opt out with SPARK_GRAFT_KEEP_WINDOW_WARNINGS=1 (ADVICE r7):
    downstream applications embedding get_spark keep the scale warning
    for their own user-authored corpus-sized windows — the allowlist
    guard only covers this repo's sources.
    """
    if os.environ.get("SPARK_GRAFT_KEEP_WINDOW_WARNINGS", "") == "1":
        return
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments: warnings are cosmetic only
