from otus_clickhouse_spark.plans.dictionary import Dictionary
from otus_clickhouse_spark.plans.projections import ProjectionRegistry

__all__ = ["Dictionary", "ProjectionRegistry"]
