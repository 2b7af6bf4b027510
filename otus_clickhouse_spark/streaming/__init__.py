from otus_clickhouse_spark.streaming.mv import MaterializedView

__all__ = ["MaterializedView"]
