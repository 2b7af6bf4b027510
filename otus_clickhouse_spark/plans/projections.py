"""Projections: pre-aggregated copies auto-selected by the optimizer.

Reference: ADD/MATERIALIZE PROJECTION + silent query redirection
(lectures/lecture_13.md:187-314, lecture_09.md:776-861,
homeworks/hw08.md:38-139). Spark realization per SURVEY.md §4: a
registered pre-aggregated companion DataFrame + a rewrite that serves a
matching ``groupBy(keys).agg`` from the projection instead of the base
scan — the one optimizer behavior Catalyst doesn't have built in.

The rewrite here is at the DataFrame-builder level (engine API), which
is where our query functions are constructed; a full Catalyst injection
(experimental ``spark.sql.extensions``) is not needed for parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Projection:
    name: str
    table: str
    group_keys: tuple[str, ...]
    # agg column name -> (func, source col); funcs: sum,count,min,max
    aggs: dict[str, tuple[str, str]]
    df: DataFrame = None


@dataclass
class ProjectionRegistry:
    projections: dict[str, Projection] = field(default_factory=dict)
    use_projections: bool = True  # optimize_use_projections (lecture_13.md:243)

    def add(self, base: DataFrame, proj: Projection) -> Projection:
        """MATERIALIZE PROJECTION: build + cache the pre-aggregate."""
        aggs = []
        for out, (fn, col) in proj.aggs.items():
            src = F.col(col) if col != "*" else F.lit(1)
            if fn == "count":
                aggs.append(F.count(src).alias(out))
            else:
                aggs.append(getattr(F, fn)(src).alias(out))
        proj.df = base.groupBy(*proj.group_keys).agg(*aggs).cache()
        self.projections[proj.name] = proj
        return proj

    def serve(self, table: str, group_keys: list[str], wanted: dict[str, tuple[str, str]]):
        """Return a projection DataFrame answering groupBy(keys).agg(wanted),
        or None → caller falls back to the base-table aggregation.

        Matching rule (same as CH's): the query's keys must be a subset
        of the projection's keys and every requested agg must be
        derivable (sum/count/min/max re-aggregate; avg = sum/count).
        """
        if not self.use_projections:
            return None
        for proj in self.projections.values():
            if proj.table != table:
                continue
            if not set(group_keys) <= set(proj.group_keys):
                continue
            if not all(a in proj.aggs and proj.aggs[a][0] == fn for a, (fn, _c) in wanted.items()):
                continue
            if set(group_keys) == set(proj.group_keys):
                return proj.df.select(*group_keys, *wanted.keys())
            # coarser grouping: re-aggregate the projection (sum/min/max/count are mergeable)
            re_aggs = []
            for a, (fn, _c) in wanted.items():
                merge_fn = "sum" if fn in ("sum", "count") else fn
                re_aggs.append(getattr(F, merge_fn)(a).alias(a))
            return proj.df.groupBy(*group_keys).agg(*re_aggs)
        return None
