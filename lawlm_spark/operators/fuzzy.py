"""Edit-distance fuzzy matching: character-level near-dup pairs.

The dedup family's third axis: exact (hash), token/set similarity
(Jaccard/MinHash/SimHash/embedding), and here CHARACTER-level edit
distance — what catches typo'd titles, OCR variants, and
near-identical URLs that tokenize differently (entity-resolution-style
matching).  Built on Spark's native `levenshtein` (JVM codegen, no
UDF), which DuckDB implements identically, so d36 is a full hash
oracle.

Scale shape: a raw all-pairs levenshtein is O(n²) and never ships.
`fuzzy_key_pairs` BLOCKS first — join only within (block_cols) groups
(the classic entity-resolution blocking pass: language + key prefix,
sorted-neighborhood key, phonetic code...) — so cost is the sum of
block sizes squared, bounded by `cap_block` exactly like the LSH
hot-bucket guard: a degenerate block (every row keyed '') would
otherwise put |block|² pairs in one task."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_key_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    block_cols: Sequence[str],
    max_distance: int = 5,
    cap_block: int | None = None,
) -> DataFrame:
    """(id_a, id_b, distance): pairs within the same block whose keys
    are within `max_distance` edits, id_a < id_b.  `cap_block` drops
    rows of oversized blocks (hot-block guard, deterministic lowest-id
    keep) before the self-join."""
    base = df.select(id_col, key_col, *block_cols)
    if cap_block is not None:
        w = Window.partitionBy(*block_cols).orderBy(F.col(id_col))
        base = (
            base.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap_block)
            .drop("_rn")
        )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(key_col).alias("_key_a"),
        *[F.col(c).alias(f"_blk_{c}") for c in block_cols],
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(key_col).alias("_key_b"),
        *[F.col(c).alias(f"_blk_{c}") for c in block_cols],
    )
    return (
        a.join(b, [f"_blk_{c}" for c in block_cols])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_key_a", "_key_b").cast("long").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )
