"""JSONL / CSV ingestion: the text interchange formats every real
training-data pipeline reads and writes (datasets ship as JSONL far
more often than parquet).

Spark-first shape: `spark.read.json/csv` with an EXPLICIT schema —
schema inference is a full extra pass over 100 TB and infers
inconsistently across shards, so it is disabled here by contract.
PERMISSIVE mode routes malformed lines into a `_corrupt_record`
column instead of failing the job; `split_corrupt` separates clean
rows from quarantined ones so a bad shard degrades into a metric, not
a dead pipeline.

Writes go through Spark's native JSON/CSV sinks (one file per
partition — the layout a downstream tokenizer fleet wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write as JSON-lines (one object per line, one file per partition)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str, keep_corrupt: bool = True
) -> DataFrame:
    """Schema-explicit JSONL scan; malformed lines land in
    `_corrupt_record` (PERMISSIVE) instead of failing the scan."""
    full = schema + (f", {CORRUPT_COL} string" if keep_corrupt else "")
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """Schema-explicit CSV scan, PERMISSIVE corrupt-record routing."""
    return (
        spark.read.schema(schema + f", {CORRUPT_COL} string")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_the_column, quarantined_raw_lines).

    The parsed frame is cached first: Spark disallows queries that
    reference ONLY `_corrupt_record` against a raw text scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    quarantine side is exactly such a query — caching materializes the
    parse once and lifts the restriction, which is also what a
    pipeline wants before fanning out into two sinks."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_orc(df: DataFrame, path: str) -> None:
    """Columnar ORC sink — the other columnar interchange format large
    warehouses hand over; round-trip certified byte-exact by d35."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """Native Spark 4 XML sink (one element per row)."""
    df.write.mode("overwrite").option("rowTag", row_tag).xml(path)


def read_xml(
    spark: SparkSession, path: str, schema: str, row_tag: str = "row"
) -> DataFrame:
    """Schema-explicit XML scan (no inference pass), PERMISSIVE
    corrupt-record routing like the JSONL path."""
    return (
        spark.read.schema(schema + f", {CORRUPT_COL} string")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .xml(path)
    )
