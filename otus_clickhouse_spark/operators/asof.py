"""ASOF JOIN (lectures/lecture_10.md:14): nearest-match inexact join.

ClickHouse's ASOF JOIN matches each left row to the right row with the
greatest ``right_ts <= left_ts`` within equal join keys. Spark has no
native batch ASOF, so this implements the **union + running-last window**
plan (SURVEY.md §2.3 J7):

    union(left, right tagged) → window over (keys) ordered by (ts, tag)
    → last non-null right payload → filter back to left rows

This is a single shuffle on the join keys (same as any equi-join on the
key), no Python, fully whole-stage-codegen'd — it scales like a
sort-merge join and avoids the per-group pandas materialization that
``merge_asof`` via applyInPandas would cost at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """ASOF-join ``left`` to ``right`` on equal ``on`` keys + nearest ts.

    Right payload columns come back prefixed with ``right_prefix``.
    ``direction='forward'`` matches the smallest right_ts >= left_ts.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    payload = [c for c in right.columns if c not in on]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.struct(*payload).alias("__rpay"),
        F.lit(0).alias("__side"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
        F.lit(1).alias("__side"),
    )
    lcols = [c for c in left.columns]
    unioned = l.select(*lcols, "__ts", "__rpay", "__side").unionByName(
        r.select(
            *[F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[c]).alias(c) if c not in on else F.col(c) for c in lcols],
            "__ts",
            "__rpay",
            "__side",
        )
    )

    # At equal ts: exact matches visible iff right sorts before left.
    side_order = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__rpay", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__rpay", ignorenulls=True).over(w)

    out = unioned.withColumn("__m", matched).filter(F.col("__side") == 1)
    if how == "inner":
        # the matched struct is null iff no right row precedes this left row
        out = out.where(F.col("__m").isNotNull())
    elif how != "left":
        raise ValueError(how)
    return out.select(
        *lcols, *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in payload]
    )
