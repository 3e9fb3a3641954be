"""Z-order (Morton-curve) data layout — multi-dimensional clustering so
parquet min/max statistics prune scans on EITHER predicate column.

Range-partitioning a table by one column makes filters on that column
prune perfectly and filters on every other column read everything.
Interleaving the bits of two (or more) normalized column ranks orders
the table along a space-filling curve: rows close in ANY dimension land
in the same files, so each file covers a narrow min/max box in every
z-ordered column and the scan planner (parquet row-group stats +
partition-file stats) skips most of the table for predicates on any of
them.  This is the manual core of Delta/Iceberg `OPTIMIZE ZORDER BY` —
kept format-free (no table-format jars in the container), with the
LAYOUT as the product: `repartitionByRange(zkey)` + per-file stats.

Exactness contract: ranks are pure integer arithmetic over caller-
supplied (min, max) bounds — ((x - min) * 2^bits) div (max - min + 1) —
and the interleave is a sum of shifted bits, so the key is a pure
function of the value and certifiable by a full hash oracle (d39).
Bounds come from the caller (at 100 TB: from table metadata or a prior
pass), not from a hidden planning-time scan.

Scale: the key is pure codegen (no shuffle, no UDF); the layout write
is ONE range repartition (the same shuffle a sorted write needs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_rank(col_expr: str, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column expression in [lo, hi] to [0, 2^bits):
    exact integer arithmetic (DIV keeps everything in longs — a double
    division would lose exactness past 2^53), monotone, and identical
    in any SQL engine."""
    if hi < lo:
        raise ValueError(f"empty bound range [{lo}, {hi}]")
    span = hi - lo + 1
    return F.expr(f"CAST(((({col_expr}) - {lo}) * {1 << bits}) DIV {span} AS BIGINT)")


def _rank_sql(expr: str, lo, hi, bits: int) -> str:
    """lo/hi may be ints or SQL expressions (e.g. scalar subqueries over
    table stats) — the oracle twin mirrors whatever the caller fed the
    Spark side."""
    span = f"(({hi}) - ({lo}) + 1)"
    return f"((({expr}) - ({lo})) * {1 << bits}) // {span}"


def interleave_bits(ranks: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit i of rank j lands at position
    i * n_dims + j.  A sum of shifted single bits — pure codegen."""
    n = len(ranks)
    terms = []
    for j, r in enumerate(ranks):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def _interleave_sql(rank_exprs: Sequence[str], bits: int) -> str:
    n = len(rank_exprs)
    terms = []
    for j, r in enumerate(rank_exprs):
        for i in range(bits):
            # full parens: DuckDB gives << LOWER precedence than +, so a
            # bare "a << 1 + b << 2" reassociates into nested shifts
            terms.append(f"(((({r}) >> {i}) & 1) << {i * n + j})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_key(
    cols: Sequence[str],
    bounds: Sequence[tuple[int, int]],
    bits: int = 16,
) -> Column:
    """The Z-order key for `cols` (integer column expressions, passed as
    SQL strings) with caller-supplied inclusive (min, max) bounds."""
    ranks = [normalized_rank(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    return interleave_bits(ranks, bits)


def zorder_key_sql(
    col_exprs: Sequence[str],
    bounds: Sequence[tuple[int, int]],
    bits: int = 16,
) -> str:
    """DuckDB/ANSI twin of zorder_key — the oracle fragment."""
    ranks = [_rank_sql(e, lo, hi, bits) for e, (lo, hi) in zip(col_exprs, bounds)]
    return _interleave_sql(ranks, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bounds: Sequence[tuple[int, int]],
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Write `df` laid out along the Z-curve of `cols`: one range
    repartition on the key, key dropped from the stored schema (it is
    derivable).  Readers need no special API — parquet min/max stats on
    the original columns do the pruning."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bounds, bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(df_with_file: DataFrame, col: str) -> DataFrame:
    """Per-file (min, max) envelope of `col` — the pruning box a stats-
    based scan planner sees.  Input must carry `_file` (input_file_name)."""
    return df_with_file.groupBy("_file").agg(
        F.min(col).alias("lo"), F.max(col).alias("hi")
    )
