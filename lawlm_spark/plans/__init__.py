from lawlm_spark.plans.ingest_api import ingest_from_api
from lawlm_spark.plans.rag import hybrid_search, ingest_documents, rag_answer

__all__ = ["ingest_documents", "ingest_from_api", "hybrid_search", "rag_answer"]
