"""ANY and PASTE joins (lectures/lecture_10.md:12-15).

- ANY JOIN: join with at most one right match per key — no fan-out
  (lecture_10.md:12-13; homeworks/hw06.md:168-185; the Join-engine
  ``ANY`` strictness at lecture_09.md:221-234). Realized by deduping the
  right side per key before a plain equi-join, so Catalyst/AQE still
  choose broadcast vs shuffle freely.
- PASTE JOIN: positional zip of two result sets (lecture_10.md:15).
  Needs a defined order on each side; we take explicit sort keys and
  join on row_number. Zipping by position is inherently a global order —
  at scale callers should paste pre-aggregated (small) results, which is
  exactly how the reference uses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "left",
    take_last_by: str | None = None,
) -> DataFrame:
    """LEFT/INNER ANY JOIN: first (or last-by-version) right row per key.

    ``take_last_by`` mirrors the ``join_any_take_last_row`` setting
    (lecture_09.md:228-234): order within key by that column descending.
    """
    order = F.col(take_last_by).desc() if take_last_by else F.lit(1)
    w = Window.partitionBy(*on).orderBy(order)
    deduped = (
        right.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    return left.join(deduped, on=on, how=how)


def paste_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[str | Column],
    right_order: list[str | Column],
    how: str = "inner",
) -> DataFrame:
    """Positional zip: i-th left row ⟷ i-th right row under given orders."""
    lw = Window.orderBy(*left_order)
    rw = Window.orderBy(*right_order)
    l = left.withColumn("__pos", F.row_number().over(lw))
    r = right.withColumn("__pos", F.row_number().over(rw))
    return l.join(r, on="__pos", how=how).drop("__pos")


def paste_zip(left: DataFrame, right: DataFrame) -> DataFrame:
    """PASTE JOIN of two RESULT SETS in their produced order (J8;
    lectures/lecture_10.md:15).

    ClickHouse zips the two results row-by-row as they stand. Order-by-
    position is only well-defined over a single stream, so each side is
    coalesced to one partition first — the same materialize-both-results
    cost the reference pays. Use :func:`paste_join` with explicit order
    columns for the scalable keyed variant.
    """
    def pos(df: DataFrame) -> DataFrame:
        w = Window.orderBy(F.monotonically_increasing_id())
        return df.coalesce(1).withColumn("__pos", F.row_number().over(w))

    return pos(left).join(pos(right), on="__pos", how="inner").drop("__pos")
