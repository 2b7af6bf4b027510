"""otus_clickhouse_spark — a PySpark-native analytics engine.

Re-expresses the query surface, table-engine semantics, and pipeline
patterns of the otus-clickhouse reference course (ClickHouse SQL) as an
idiomatic Spark SQL / DataFrame engine, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Architecture: declare logical plans with the DataFrame/SQL API and let
Catalyst + Tungsten choose physical strategies (SURVEY.md §4 shows ~90%
of the reference's optimizer behavior is Catalyst built-in). Custom code
is limited to semantics Spark lacks: FINAL views, ASOF/PASTE/ANY joins,
WITH FILL, dictionaries, projections, and the pipeline operators.
"""

from otus_clickhouse_spark.engine import Engine
from otus_clickhouse_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
