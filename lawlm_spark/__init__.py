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
  config       engine config mirroring the reference's config.yml keys
  sources/     testdata loader, paginated REST scan, Qdrant sink + mirror
  functions/   scalar column expressions (text, keys/uuid5, vectors)
  operators/   relational + retrieval operators (top-k, RRF, BM25, dedup,
               similarity, chunking, multimodal)
  plans/       composed pipelines (ingest E1, RAG query E2)
  streaming/   Structured Streaming variants (windowed counts, dedup)
  validation   the declared query set + DuckDB oracle SQL (driver contract)
"""

__version__ = "0.1.0"
