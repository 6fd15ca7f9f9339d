from dc43_spark.functions import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
