"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. These helpers cover
the cases AQE can't: a broadcast-ineligible dimension joined on a key
where a handful of values dominate (the classic hot-key join at
100 TB), and high-cardinality-input aggregation onto few groups.

Salting trades one extra small-side replication factor for an even
shuffle: the skewed (fact) side gets a uniform salt in [0, salt); the
other side is replicated ``salt`` times so every (key, salt) bucket
can still match. Salt is derived from a hash of the whole row, not
rand(), so retried tasks produce identical output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution has hot values.

    The shuffle key becomes (key..., __salt) — hot keys spread over
    ``salt`` partitions; ``other`` is exploded ``salt``× (keep it the
    smaller side). Output columns match a plain ``skewed.join(other,
    on, how)``.
    """
    skew_cols = [c for c in skewed.columns if c not in on]
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    o = other.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = s.join(o, on=[*on, "__salt"], how=how)
    return out.select(*on, *skew_cols, *[c for c in other.columns if c not in on])


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 64,
) -> DataFrame:
    """Two-phase aggregation through a salted intermediate key.

    ``aggs``: out_name -> (fn, col) with fn in {sum, count, min, max}
    (the mergeable functions — same set SummingMergeTree handles,
    SURVEY.md A14). Phase 1 aggregates on (keys..., salt) spreading a
    hot group across ``salt`` reducers; phase 2 merges the partials.
    Spark's own partial aggregation usually makes this unnecessary —
    it exists for expressions that defeat partial agg (e.g. distinct
    rewrites) and as the documented pattern.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[getattr(F, merge_fn[fn])(out).alias(out) for out, (fn, _c) in aggs.items()]
    )
