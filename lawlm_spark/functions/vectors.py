"""Dense-vector column expressions.

Everything here is a pure Catalyst expression over `array<float|double>`
— sequential left-to-right folds, so results are bitwise deterministic
and identical across engines (the DuckDB oracle computes the same fold).
No Python boundary is crossed; at scale these run inside whole-stage
codegen next to the scan.

The reference delegates all vector math to Qdrant (COSINE space,
qdrant_manager.py:21-26) and never normalizes client-side (bug B6,
data_extraction.py:269-274); this engine normalizes explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i, accumulated left-to-right in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def normalize(a: Column) -> Column:
    """Unit-normalize (fixes reference bug B6 — SURVEY.md §1.4)."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n)).otherwise(
        F.transform(a, lambda x: x.cast("double"))
    )


def fake_embedding(text: Column, dim: int = 64, seed: str = "v1") -> Column:
    """Deterministic fake embedder (SURVEY.md §5.4): seeded md5 hash of the
    text per dimension -> value in [-1, 1), then unit-normalized.

    Portable: the DuckDB oracle can compute the identical vector
    (md5 + hex->int), so embed pipelines are oracle-checkable end to end.
    The real-model path (operators/embedding.py) swaps in behind the same
    schema.
    """
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(seed), i, text)), 1, 8), 16, 10).cast(
                "double"
            )
            % 2000.0
            - 1000.0
        )
        / 1000.0,
    )
    return normalize(raw)


def fake_embedding_oracle_sql(text_expr: str, dim: int = 64, seed: str = "v1") -> str:
    """DuckDB SQL computing exactly `fake_embedding` (for oracle queries)."""
    raw = (
        f"list_transform(generate_series(0, {dim - 1}), i -> "
        f"((('0x' || substring(md5(concat_ws(':', '{seed}', i, {text_expr})), 1, 8))::BIGINT "
        f"% 2000.0 - 1000.0) / 1000.0))"
    )
    nrm = f"sqrt(list_sum(list_transform({raw}, x -> x * x)))"
    return f"list_transform({raw}, x -> x / {nrm})"
