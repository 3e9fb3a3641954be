from lawlm_spark.operators import (
    bm25,
    chunking,
    dedup,
    embedding,
    multimodal,
    ranking,
    relational,
    similarity,
)

__all__ = [
    "bm25",
    "chunking",
    "dedup",
    "embedding",
    "multimodal",
    "ranking",
    "relational",
    "similarity",
]
