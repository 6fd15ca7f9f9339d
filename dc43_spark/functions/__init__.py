from dc43_spark.functions import asof, dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal", "asof"]
