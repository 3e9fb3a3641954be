from lawlm_spark.plans.rag import hybrid_search, ingest_documents, rag_answer

__all__ = ["ingest_documents", "hybrid_search", "rag_answer"]
