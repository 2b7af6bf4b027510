"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``otus_clickhouse_spark/queries.py`` (core
relational surface, SURVEY.md §2) plus the extension modules it pulls
in: ``queries_extra.py``, ``queries_behavioral.py``,
``queries_pipeline.py`` (training-data pipeline, SURVEY.md §7 Phase 7),
and ``queries_tpch.py`` (TPC-H-adapted h01–h22). ``len(queries())``
is the authoritative count — no number is repeated here so the
docstring can't go stale; every entry is oracle-paired (x34's media
decode isn't SQL-expressible, so its oracle pins the deterministic
fixture's constant counts instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from otus_clickhouse_spark.queries import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    from otus_clickhouse_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from otus_clickhouse_spark.queries import all_oracles

    return all_oracles()
