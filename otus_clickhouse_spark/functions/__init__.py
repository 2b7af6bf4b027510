from otus_clickhouse_spark.functions.clickhouse import register_clickhouse_functions

__all__ = ["register_clickhouse_functions"]
