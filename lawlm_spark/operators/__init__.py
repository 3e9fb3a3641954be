from lawlm_spark.operators import bm25, chunking, dedup, ranking, similarity

__all__ = ["bm25", "chunking", "dedup", "ranking", "similarity"]
