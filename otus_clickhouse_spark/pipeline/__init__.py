from otus_clickhouse_spark.pipeline import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
