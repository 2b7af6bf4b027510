"""GraphiteMergeTree rollup (lectures/lecture_07.md:793-817).

The reference engine stores metric rows ``(Path, Time, Value, Timestamp)``
and a rollup config of *patterns*: a regexp over ``Path`` selecting an
aggregation function plus *retention* rules ``(age, precision)`` — rows
older than ``age`` seconds are re-bucketed to ``precision``-second
granularity and aggregated with the pattern's function during merges.

Spark realization: a declarative re-aggregation — one hash shuffle on
``(path, bucketed time)`` with map-side partial aggregation. Function
selection per path is a CASE over the pattern regexps (whole-stage
codegen, no UDF); because different paths may use different functions we
compute the four cheap partial aggregates and pick per group, which costs
a few extra accumulator slots but keeps a single combiner-friendly pass —
at 100 TB this plans exactly like any groupBy, and bucketing the table by
``path`` elides the exchange.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Retention:
    """Rows with age >= ``age`` seconds roll up to ``precision`` seconds."""

    age: int
    precision: int


@dataclass
class GraphitePattern:
    """Rollup rule: first pattern whose ``regexp`` matches Path applies.

    ``regexp=None`` is the default (catch-all) pattern, like the
    ``<default>`` block in graphite_rollup config.
    """

    regexp: str | None
    function: str  # avg | sum | min | max | any
    retention: list[Retention] = field(default_factory=list)


_FUNCS = ("avg", "sum", "min", "max", "any")


def graphite_rollup(
    df: DataFrame,
    patterns: list[GraphitePattern],
    now,  # Column or literal timestamp: age reference point
    path_col: str = "path",
    time_col: str = "time",
    value_col: str = "value",
    ts_col: str | None = "timestamp",
) -> DataFrame:
    """Roll up a Graphite metric table per the pattern config.

    Returns one row per (path, rolled-up time bucket) with the pattern's
    aggregate of ``value_col`` and, when ``ts_col`` is given, the max
    version timestamp (the engine keeps the row with the latest
    ``Timestamp`` as the aggregation witness).
    """
    for p in patterns:
        if p.function not in _FUNCS:
            raise ValueError(f"unsupported rollup function {p.function!r}")
        if not p.retention:
            raise ValueError("each pattern needs at least one retention rule")
    if not any(p.regexp is None for p in patterns):
        # graphite_rollup configs always carry a <default> block; without
        # one, unmatched paths would silently collapse into a NULL bucket
        raise ValueError("patterns must include a catch-all (regexp=None) default")

    now_c = now if isinstance(now, Column) else F.lit(now).cast("timestamp")
    age = F.unix_timestamp(now_c) - F.unix_timestamp(F.col(time_col))

    # pattern index per row: first matching regexp wins (CH semantics)
    idx: Column = F.lit(None).cast("int")
    chain = None
    for i, p in enumerate(patterns):
        cond = F.lit(True) if p.regexp is None else F.col(path_col).rlike(p.regexp)
        chain = F.when(cond, F.lit(i)) if chain is None else chain.when(cond, F.lit(i))
    idx = chain

    # precision per row: within the matched pattern, the retention rule
    # with the largest age <= row age (rules applied oldest-first)
    prec = None
    for i, p in enumerate(patterns):
        rules = sorted(p.retention, key=lambda r: -r.age)
        inner = None
        for r in rules:
            c = age >= F.lit(r.age)
            inner = F.when(c, F.lit(r.precision)) if inner is None else inner.when(c, F.lit(r.precision))
        inner = inner.otherwise(F.lit(rules[-1].precision))
        prec = F.when(idx == i, inner) if prec is None else prec.when(idx == i, inner)

    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(time_col)) / prec) * prec).cast("long")
    )

    rolled = df.withColumn("__pat", idx).withColumn("__bucket", bucket)
    aggs = [
        F.avg(value_col).alias("__avg"),
        F.sum(value_col).alias("__sum"),
        F.min(value_col).alias("__min"),
        F.max(value_col).alias("__max"),
        F.first(value_col).alias("__any"),
    ]
    if ts_col:
        aggs.append(F.max(ts_col).alias(ts_col))
    grouped = rolled.groupBy(path_col, "__pat", "__bucket").agg(*aggs)

    val = None
    for i, p in enumerate(patterns):
        pick = F.col(f"__{p.function}")
        val = F.when(F.col("__pat") == i, pick) if val is None else val.when(F.col("__pat") == i, pick)

    out_cols = [
        F.col(path_col),
        F.col("__bucket").alias(time_col),
        val.alias(value_col),
    ]
    if ts_col:
        out_cols.append(F.col(ts_col))
    return grouped.select(*out_cols)
