"""ORDER BY … WITH FILL — gap-filling for time series (SURVEY.md §2.5 W5).

The reference uses ``WITH FILL STEP n`` to densify sparse time buckets
(lectures/lecture_20.md:29-33,216-241; homeworks/hw14.md:35-70).
Spark has no native equivalent; the declarative plan is:

    spine = sequence(min, max, step) → explode   (generated, no scan)
    result = spine LEFT JOIN data ON bucket      (broadcast-able spine)

The spine is tiny relative to the data (one row per bucket), so at
100 TB the join broadcasts the spine and the whole thing stays one
stage over the aggregated (already small) side.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_fill(
    df: DataFrame,
    fill_col: str,
    step=None,
    start=None,
    stop=None,
    fill_values: dict | None = None,
    interpolate: dict | None = None,
) -> DataFrame:
    """Densify ``fill_col`` from start..stop by step; missing rows get
    ``fill_values`` (default: nulls → caller coalesces).

    ``step`` may be an int (numeric columns) or a string interval like
    ``'1 day'`` (date/timestamp columns). start/stop default to the
    min/max present in the data (ClickHouse WITH FILL default bounds).

    ``interpolate`` maps column → rule, reproducing ClickHouse's
    ``INTERPOLATE (col [AS expr])``: ``None`` carries the previous
    row's value forward; ``"col + k"`` / ``"col - k"`` applies the
    linear expression iteratively from the last real value (the only
    expr shapes the reference's surface uses; anything else raises).
    The interpolation windows are unpartitioned — WITH FILL output is
    a final ordered result set (post-aggregation, one row per bucket),
    exactly the size regime CH materializes on the initiator.
    """
    dtype = dict(df.dtypes)[fill_col]
    bounds = df.agg(
        F.min(fill_col).alias("lo"), F.max(fill_col).alias("hi")
    )
    lo = F.lit(start) if start is not None else F.col("lo")
    hi = F.lit(stop) if stop is not None else F.col("hi")
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        step_expr = F.expr(f"INTERVAL {step or '1 day'}")
    else:
        step_expr = F.lit(step if step is not None else 1)
    # sequence() takes only integral/temporal bounds; CH UInt64
    # arithmetic lands as DECIMAL(p, 0) (r12 WITH FILL fuzz finding) —
    # generate the grid as bigint and cast back so the join key types
    # match. Fractional decimals keep the old (erroring) path: CH's
    # surface only fills integral/temporal keys.
    seq_type = dtype
    import re as _re

    if _re.fullmatch(r"decimal\(\d+,\s*0\)", dtype):
        seq_type = "bigint"
        # a FROM/TO bound may exceed the data column's precision
        # (DECIMAL(1,0) data, FILL TO 12) — widen; the join coerces
        # both sides to the common wider type
        dtype = "decimal(38,0)"
    spine = bounds.select(
        F.explode(
            F.sequence(lo.cast(seq_type), hi.cast(seq_type), step_expr)
        ).alias("__seq")
    ).select(F.col("__seq").cast(dtype).alias(fill_col))
    if stop is not None:
        # ClickHouse WITH FILL TO bound is EXCLUSIVE; default (data max)
        # stays inclusive
        spine = spine.where(F.col(fill_col) < F.lit(stop).cast(dtype))
    # WITH FILL only ADDS rows: source rows whose key is off the
    # generated grid (between steps, outside FROM/TO) are kept, not
    # dropped (r12 WITH FILL fuzz finding — a STEP 2 fill was dropping
    # the odd keys present in the data)
    spine = spine.unionByName(df.select(fill_col).distinct()).distinct()
    data = df.withColumn("__orig", F.lit(1)) if interpolate else df
    out = spine.join(
        F.broadcast(data) if _broadcast_data_side(df) else data, on=fill_col, how="left"
    )
    for c, v in (fill_values or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    if interpolate:
        from pyspark.sql import Window

        w = Window.orderBy(fill_col).rowsBetween(Window.unboundedPreceding, 0)
        carried = {c: F.last(c, ignorenulls=True).over(w) for c in interpolate}
        # rows since the last real row: position inside the filled gap
        grp = F.sum(F.coalesce(F.col("__orig"), F.lit(0))).over(w)
        off = F.row_number().over(Window.partitionBy(grp).orderBy(fill_col)) - 1
        for c, rule in interpolate.items():
            if rule is None:  # INTERPOLATE (c): repeat previous value
                out = out.withColumn(c, F.coalesce(F.col(c), carried[c]))
                continue
            m = re.fullmatch(rf"\s*{re.escape(c)}\s*([+-])\s*(\d+(?:\.\d+)?)\s*", rule)
            if not m:
                raise ValueError(f"unsupported INTERPOLATE expr: {rule!r}")
            delta = float(m.group(2)) * (1 if m.group(1) == "+" else -1)
            if delta == int(delta):
                delta = int(delta)
            out = out.withColumn(
                c, F.coalesce(F.col(c), carried[c] + F.lit(delta) * off)
            )
        out = out.drop("__orig")
    return out


_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    m = re.fullmatch(r"\s*(-?\d+)\s*([bkmgt]?)b?\s*", str(v).lower())
    if not m:
        return -1
    return int(m.group(1)) * _UNITS.get(m.group(2) or "b", 1)


def _broadcast_data_side(df: DataFrame) -> bool:
    """Should the data side of the spine join be broadcast?

    WITH FILL's normal regime is a post-aggregation result set (one row
    per bucket — CH materializes it on the initiator), which is always
    broadcast-safe: detected as an Aggregate in the optimized plan.
    For raw, un-aggregated inputs fall back to Catalyst's size estimate
    against the session broadcast threshold, so applying WITH FILL to a
    100 TB scan degrades to a shuffle join instead of an executor OOM.
    """
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if "Aggregate" in plan.toString():
            return True
        thr = _parse_bytes(
            df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
        )
        return 0 < int(str(plan.stats().sizeInBytes())) <= thr
    except Exception:
        return False
