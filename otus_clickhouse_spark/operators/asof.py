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

import re

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


_ASOF_SQL_RE = re.compile(
    r"\bFROM\s+(\w+)\s+ASOF\s+(LEFT\s+)?JOIN\s+(\w+)\s+ON\s+"
    r"(.+?)(?=\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT|SETTINGS)\b|$)",
    re.IGNORECASE | re.DOTALL,
)
_INEQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*(>=|<=|>|<)\s*(\w+)\.(\w+)\s*$")
_EQ_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")


def rewrite_asof_sql(engine, text: str) -> str | None:
    """SQL-level ASOF JOIN (J7; lectures/lecture_10.md:14).

    Supported shape — equality keys plus exactly one ts inequality,
    qualified by the table names::

        SELECT … FROM events ASOF [LEFT] JOIN quotes
        ON events.k = quotes.k AND events.ts >= quotes.ts [WHERE …]

    The join is materialized through :func:`asof_join` (single-shuffle
    union+window plan) and registered as a view; the surrounding query
    then runs over it. Right-side payload columns that collide with
    left-side names come back prefixed ``r_`` (references like
    ``quotes.col`` are rewritten accordingly).
    """
    m = _ASOF_SQL_RE.search(text)
    if not m:
        return None
    lname, left_kw, rname, cond = m.groups()
    on: list[str] = []
    ineq = None
    for clause in re.split(r"\bAND\b", cond, flags=re.IGNORECASE):
        im = _INEQ_RE.match(clause)
        if im:
            ineq = im.groups()
            continue
        em = _EQ_RE.match(clause)
        if not em:
            raise ValueError(f"unsupported ASOF ON clause: {clause!r}")
        t1, c1, t2, c2 = em.groups()
        if c1 != c2 or {t1, t2} != {lname, rname}:
            raise ValueError("ASOF equality keys must be same-named columns")
        on.append(c1)
    if ineq is None:
        raise ValueError("ASOF JOIN needs one ts inequality in ON")
    t1, c1, op, t2, c2 = ineq
    if t1 == lname:
        left_ts, right_ts = c1, c2
    else:  # reversed operand order: flip the comparison
        left_ts, right_ts = c2, c1
        op = {">=": "<=", "<=": ">=", ">": "<", "<": ">"}[op]
    direction = "backward" if op in (">=", ">") else "forward"
    exact = op in (">=", "<=")

    left, right = engine.table(lname), engine.table(rname)
    payload = [c for c in right.columns if c not in on]
    collide = any(c in left.columns for c in payload)
    prefix = "r_" if collide else ""
    joined = asof_join(
        left,
        right,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        direction=direction,
        allow_exact_matches=exact,
        how="left" if left_kw else "inner",
        right_prefix=prefix,
    )
    view = f"__asof_{abs(hash((lname, rname, tuple(on)))) % 10**8}"
    joined.createOrReplaceTempView(view)
    text = text[: m.start()] + f"FROM {view}" + text[m.end() :]
    # requalify column references: left.c → c, right.c → [r_]c
    text = re.sub(rf"\b{lname}\.(\w+)", r"\1", text)
    text = re.sub(
        rf"\b{rname}\.(\w+)",
        lambda mm: (prefix + mm.group(1)) if mm.group(1) in payload else mm.group(1),
        text,
    )
    return text
