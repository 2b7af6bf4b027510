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

import re

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


# helper columns _global_index materializes; withColumn would silently
# REPLACE same-named user columns, corrupting pasted data, so inputs
# carrying any of these are rejected up front
_PASTE_RESERVED = ("__pos", "__pid", "__mid", "__off", "__cnt")


def _global_index(df: DataFrame, order: list[str | Column] | None) -> DataFrame:
    """Attach ``__pos`` = 1..N in total order WITHOUT a single-partition
    window (the naive ``Window.orderBy`` with no partition moves every
    row to one task — the thing that would bottleneck a 100×-scale
    paste).

    Two-pass global index:
      1. range-partition + local sort by the order keys (or keep the
         produced partitioning when ``order`` is None), so partition-id
         order IS the global order;
      2. count rows per partition (≤ shuffle.partitions rows — the only
         driver-scale window here), broadcast the cumulative offsets
         back, and number rows with a partition-LOCAL window + offset.

    The frame is localCheckpoint'ed once between the passes: both the
    count job and the numbering job must see identical partition
    placement (range-partitioner sampling and
    ``monotonically_increasing_id`` are recompute-unstable otherwise) —
    the same materialize-each-side-once cost ClickHouse pays to zip two
    result streams.
    """
    clash = [c for c in df.columns if c in _PASTE_RESERVED]
    if clash:
        raise ValueError(
            f"paste join input carries reserved helper column(s) {clash}; "
            "rename them before pasting"
        )
    if order:
        t = df.repartitionByRange(*order).sortWithinPartitions(*order)
        local_order: list = list(order)
    else:
        # produced order: monotonically_increasing_id embeds the
        # partition id in its high bits, so ordering by it within the
        # existing partitioning is partition-major ≡ stream order
        t = df.withColumn("__mid", F.monotonically_increasing_id())
        local_order = [F.col("__mid")]
    t = t.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=True)
    # per-partition counts: ≤ #partitions rows — a bounded driver scalar
    # (same class as the repo's vocab-total / k-means-seed collects), and
    # folding them driver-side keeps the plan free of ANY
    # single-partition exchange
    counts = {r["__pid"]: r["__cnt"] for r in t.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__cnt")).collect()}
    offs, acc = [], 0
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    off_df = t.sparkSession.createDataFrame(
        offs or [(0, 0)], "__pid INT, __off BIGINT"
    )
    local_w = Window.partitionBy("__pid").orderBy(*local_order)
    out = (
        t.join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            "__pos", F.row_number().over(local_w) + F.coalesce("__off", F.lit(0))
        )
        .drop("__pid", "__off")
    )
    return out.drop("__mid") if not order else out


def paste_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[str | Column],
    right_order: list[str | Column],
    how: str = "inner",
) -> DataFrame:
    """Positional zip: i-th left row ⟷ i-th right row under given orders.

    Each side gets a distributed two-pass global index (no
    single-partition sort — see :func:`_global_index`), then a plain
    equi-join on position that Catalyst/AQE plan freely. Ties within the
    order keys break arbitrarily, matching the reference's
    multi-threaded nondeterminism.
    """
    l = _global_index(left, left_order)
    r = _global_index(right, right_order)
    return l.join(r, on="__pos", how=how).drop("__pos")


def paste_zip(left: DataFrame, right: DataFrame) -> DataFrame:
    """PASTE JOIN of two RESULT SETS in their produced order (J8;
    lectures/lecture_10.md:15).

    ClickHouse zips the two results row-by-row as they stand. "Produced
    order" over a distributed result is partition-major order — for the
    usual case of pasting ORDER BY'd results the range-partitioned sort
    makes that exactly the global order, with no single-partition
    coalesce (ClickHouse itself documents the multi-threaded PASTE
    result as nondeterministic for unordered inputs)."""
    return (
        _global_index(left, None)
        .join(_global_index(right, None), on="__pos", how="inner")
        .drop("__pos")
    )


_ANY_JOIN_SQL_RE = re.compile(
    # both CH word orders (`ANY LEFT JOIN` and `LEFT ANY JOIN`,
    # hw06.md:168-185 uses the latter) with optional table aliases
    r"\bFROM\s+(\w+)(?:\s+(?:AS\s+)?(?!ANY\b|LEFT\b|INNER\b|JOIN\b)(\w+))?\s+"
    r"(?:ANY\s+(LEFT|INNER)?\s*|(LEFT|INNER)\s+ANY\s+)JOIN\s+"
    r"(\w+)(?:\s+(?:AS\s+)?(?!USING\b|ON\b)(\w+))?\s+"
    r"(?:USING\s*\(?([\w\s,]+?)\)?|ON\s+(.+?))"
    r"(?=\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT|SETTINGS)\b|$)",
    re.IGNORECASE | re.DOTALL,
)


def rewrite_any_join_sql(engine, text: str) -> str | None:
    """SQL-level ANY JOIN (J6; lectures/lecture_10.md:12-13,
    homeworks/hw06.md:168-185): the right side is deduplicated to one
    row per key before a normal join — no fan-out. Supports ``USING
    (k, …)`` and same-named ``ON a.k = b.k`` conjunctions.
    """
    m = _ANY_JOIN_SQL_RE.search(text)
    if not m:
        return None
    lname, lalias, how1, how2, rname, ralias, using, on_clause = m.groups()
    lrefs = {lname} | ({lalias} if lalias else set())
    right = engine.table(rname)
    if using:
        keys = [k.strip() for k in using.split(",") if k.strip()]
    else:
        keys = []
        for clause in re.split(r"\bAND\b", on_clause, flags=re.IGNORECASE):
            em = re.match(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", clause)
            if not em:
                raise ValueError(f"unsupported ANY JOIN ON clause: {clause!r}")
            t1, c1, t2, c2 = em.groups()
            lcol, rcol = (c1, c2) if t1 in lrefs else (c2, c1)
            if rcol != lcol:  # differently-named equi-keys: align to left
                right = right.withColumnRenamed(rcol, lcol)
            keys.append(lcol)
    how = "inner" if (how1 or how2 or "").strip().upper() == "INNER" else "left"
    joined = any_join(engine.table(lname), right, on=keys, how=how)
    view = f"__anyjoin_{abs(hash((lname, rname, tuple(keys)))) % 10**8}"
    joined.createOrReplaceTempView(view)
    text = text[: m.start()] + f"FROM {view}" + text[m.end() :]
    refs = {lname, rname} | ({lalias} if lalias else set()) | ({ralias} if ralias else set())
    text = re.sub(rf"\b(?:{'|'.join(refs)})\.(\w+)", r"\1", text)
    return text
