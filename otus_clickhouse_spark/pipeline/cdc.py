"""Change-data-capture / slowly-changing-dimension operators.

Training-data pipelines version their sources: a base snapshot plus
incremental update batches must merge into either the latest state
(ReplacingMergeTree's job — operators/final.py) or a full SCD-type-2
history with validity intervals, which the reference's engine family
has no native operator for. Spark-first shape: one union + one
key-partitioned window — a single shuffle on the merge key regardless
of how many update batches arrive, so the plan is identical at 100 TB
(the window never sees more rows per key than that key's version
count).

Reference anchor: ReplacingMergeTree latest-wins semantics
(lectures/lecture_07.md:551-678) — SCD2 is its history-preserving
complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    attrs: list[str],
) -> DataFrame:
    """Merge a base snapshot with an update batch into SCD2 history.

    Every (key, ts) version becomes a row carrying ``valid_from`` /
    ``valid_to`` / ``is_current``: ``valid_from`` is the version's own
    timestamp, ``valid_to`` the next version's (NULL while current).
    Consecutive versions with identical attribute values collapse into
    one interval (no-op updates don't open a new version row).

    One shuffle: the union is partition-preserving, the window
    partitions by ``key`` — a 1000-executor cluster processes each key's
    version chain locally.
    """
    cols = [key, ts_col, *attrs]
    merged = base.select(*cols).unionByName(updates.select(*cols))
    w = Window.partitionBy(key).orderBy(ts_col)
    # collapse no-op versions: a row opens a new interval only when any
    # tracked attribute differs from the previous version's
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(F.col(a)).over(w)
        changed = changed | (~F.col(a).eqNullSafe(prev))
    opened = merged.withColumn(
        "__new_version", (F.row_number().over(w) == 1) | changed
    ).where(F.col("__new_version"))
    w2 = Window.partitionBy(key).orderBy(ts_col)
    return (
        opened.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__new_version")
    )


def scd2_as_of(history: DataFrame, ts, ts_col: str = "valid_from") -> DataFrame:
    """Time-travel read over an SCD2 history: the version valid at
    ``ts`` (``valid_from <= ts < valid_to``). A pure filter — partition
    pruning applies when history is written partitioned by
    ``valid_from`` buckets."""
    t = F.lit(ts)
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
