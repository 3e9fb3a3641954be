from lawlm_spark.functions import keys, text, vectors

__all__ = ["keys", "text", "vectors"]
