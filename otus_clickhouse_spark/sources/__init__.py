from otus_clickhouse_spark.sources.readers import (
    file_table,
    generate_random,
    merge_tables,
    numbers,
    remote_jdbc,
    url_table,
)

__all__ = [
    "file_table",
    "url_table",
    "numbers",
    "generate_random",
    "merge_tables",
    "remote_jdbc",
]
