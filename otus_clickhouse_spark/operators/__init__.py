from otus_clickhouse_spark.operators.asof import asof_join
from otus_clickhouse_spark.operators.final import final_view
from otus_clickhouse_spark.operators.joins import any_join, paste_join
from otus_clickhouse_spark.operators.with_fill import with_fill

__all__ = ["asof_join", "final_view", "any_join", "paste_join", "with_fill"]
