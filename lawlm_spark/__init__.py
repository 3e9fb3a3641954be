"""lawlm_spark — a PySpark-native analytics engine with the capabilities
of the zain-altaf/lawlm legal-RAG pipeline, rebuilt Spark-first.

The reference (/root/reference, snapshot 2026-04-24) is a single-threaded
imperative Python pipeline: CourtListener REST -> clean -> entity-extract ->
chunk -> embed (dense+BM25) -> Qdrant upsert, plus an online hybrid-RRF
search path.  This package re-expresses every operator (SURVEY.md §2) as
declarative DataFrame/SQL plans so Catalyst + Tungsten pick the physical
strategy, and adds the large-scale training-data operators (dedup families,
similarity search, text analytics, multimodal plumbing) the reference lacks.

Layout:
  session      SparkSession factory tuned for the bench/test environment
  sources/     testdata loader, parquet index mirror (vector-store sink)
  functions/   scalar column expressions (text, keys/uuid5, vectors, llm)
  operators/   relational + retrieval operators (top-k, RRF, BM25, dedup,
               similarity, chunking, embedding)
  plans/       composed pipelines (ingest E1, RAG query E2)
  streaming/   Structured Streaming variants (windowed counts, dedup)

The declared validation queries + DuckDB oracle SQL (driver contract)
live in the repo-root __spark_entry__.py.
"""

__version__ = "0.2.0"
