"""Parquet scans over the driver-generated synthetic tables (TESTDATA.md).

These are plain `spark.read.parquet` scans — filters and projections
declared downstream reach the scan via Catalyst pushdown (verify with
`.explain("formatted")`: PushedFilters / ReadSchema).  At 100 TB the same
code path works against a partitioned table layout; nothing here assumes
single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), unreadable without this
        # conf.  Set it here (runtime-settable) so the loader works on ANY
        # session, including ones not built by lawlm_spark.session.get_spark
        # (e.g. the verification driver's own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ts is rebuilt below as TIMESTAMP_LTZ (timestamp_micros), which
        # renders in the session timezone; pin UTC so wall-clock values
        # match the oracle's naive TIMESTAMP regardless of host tz.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long (spark.sql.legacy.parquet.nanosAsLong);
        # integer-divide to µs (exact — no double roundoff) so the view's ts
        # equals the DuckDB oracle's microsecond TIMESTAMP.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
