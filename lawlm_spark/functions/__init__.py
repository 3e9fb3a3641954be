from lawlm_spark.functions import keys, llm, text, vectors

__all__ = ["keys", "llm", "text", "vectors"]
