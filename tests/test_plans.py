"""Plan hygiene: the physical plans must carry the scale properties we
designed for (SURVEY.md §4). These assertions are the `.explain` review
baked into CI: pushdown reaching parquet, dims broadcast, partial
aggregation, whole-stage codegen.
"""

import pytest

from otus_clickhouse_spark.queries import all_queries


def plan_of(spark, sf_dir, name: str, execute: bool = False) -> str:
    df = all_queries()[name](spark, sf_dir)
    if execute:  # AQE finalizes subplans (and codegen spans) only at runtime
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_parquet(spark, sf_dir):
    """P3: WHERE reaches the scan (≈ PREWHERE / granule pruning)."""
    plan = plan_of(spark, sf_dir, "q02_filtered_count")
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_column_pruning(spark, sf_dir):
    """Scan reads only needed columns (columnar property, lecture_02.md:119)."""
    plan = plan_of(spark, sf_dir, "q02_filtered_count")
    assert "ReadSchema: struct<l_extendedprice:double,l_returnflag:string>" in plan


def test_dims_broadcast_in_join(spark, sf_dir):
    """J9: small sides broadcast — lineitem never reshuffles (q03)."""
    plan = plan_of(spark, sf_dir, "q03_top_orders")
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation(spark, sf_dir):
    """A17: two-phase partial/final agg ≈ AggregatingTransform + Merge."""
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary", execute=True)
    # codegen stages render as "*(n) HashAggregate…" in the final AQE plan
    assert "*(1)" in plan or "*(2)" in plan or "WholeStageCodegen" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    """O3: ORDER BY+LIMIT compiles to TakeOrderedAndProject (no full sort)."""
    plan = plan_of(spark, sf_dir, "q25_topk")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_strategies(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "q08_semi_join")
    assert "LeftAnti" in plan_of(spark, sf_dir, "q09_anti_join")


def test_ann_broadcasts_queries_not_corpus(spark, sf_dir):
    """x04: query vectors broadcast; corpus is never shuffled for scoring."""
    plan = plan_of(spark, sf_dir, "x04_embedding_topk")
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    """ASOF join plan: exactly one exchange for the union+window (plus the
    final agg's); no pandas, no cartesian."""
    plan = plan_of(spark, sf_dir, "q12_asof_join")
    assert "Window" in plan
    assert "Cartesian" not in plan and "PythonUDF" not in plan


def test_partition_directory_pruning(spark, tmp_path):
    """S1: PARTITION BY dirs prune at plan time (≈ CH partition key index,
    lecture_07.md:198-228)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "events_part")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).alias("ym")
    ).write.partitionBy("ym").parquet(path)
    df = spark.read.parquet(path).where(F.col("ym") == 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ym" in plan
    # only the matching directory's rows are read
    assert df.count() == 250


def test_graphite_rollup_single_shuffle(spark, sf_dir):
    """q65: the rollup is one combiner-friendly hash aggregation —
    exactly one exchange, partial+final HashAggregate, no UDFs."""
    plan = plan_of(spark, sf_dir, "q65_graphite_rollup")
    assert plan.count("Exchange") == 1
    assert "PythonUDF" not in plan


def test_limit_by_single_window_shuffle(spark, sf_dir):
    """q66: LIMIT n BY plans as agg shuffle + one window partitioned on
    the BY keys — no global sort before the per-group cut."""
    plan = plan_of(spark, sf_dir, "q66_limit_by")
    assert "Window" in plan and "PythonUDF" not in plan


def test_window_funnel_single_shuffle_no_python(spark, sf_dir):
    """The funnel chain machine is one user-keyed exchange and stays
    entirely JVM-side (aggregate() HOF, not a UDF)."""
    from otus_clickhouse_spark.io import read_table
    from otus_clickhouse_spark.operators.behavioral import window_funnel

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    wf = window_funnel(
        ev, "user_id", "ts", ["event_type='view'", "event_type='click'"], 3600
    )
    plan = wf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert "Python" not in plan and "InPandas" not in plan


def test_top_k_partial_aggregation(spark, sf_dir):
    """top_k pre-aggregates (group, value) with a map-side partial pass
    so the shuffle carries distinct values, not events."""
    from otus_clickhouse_spark.io import read_table
    from otus_clickhouse_spark.operators.behavioral import top_k

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    plan = top_k(ev, "event_type", 3)._jdf.queryExecution().executedPlan().toString()
    assert sum(1 for l in plan.splitlines() if "HashAggregate" in l) == 2


def test_tpch_h05_all_dims_broadcast(spark, sf_dir):
    """h05's 5-join tree: at this SF every join side is small enough
    that the size-based planner broadcasts it WITHOUT any forced hint
    (only nation/region are hinted) — the lineitem fact streams through
    without a single sort-merge shuffle. At 100 TB the same plan
    degrades to shuffle joins instead of breaking the broadcast cap."""
    plan = plan_of(spark, sf_dir, "h05_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in plan


def test_tpch_h03_filters_push_to_scans(spark, sf_dir):
    """h03: the segment / both date cutoffs reach their parquet scans."""
    plan = plan_of(spark, sf_dir, "h03_shipping_priority")
    assert "EqualTo(c_mktsegment,AUTOMOBILE)" in plan
    assert "GreaterThan(l_shipdate," in plan
    assert "LessThan(o_orderdate," in plan


def test_tpch_h21_no_python_and_partial_agg(spark, sf_dir):
    """h21 (max-ship waiting suppliers): stays JVM-side with two-phase
    aggregation for the per-order max/count."""
    plan = plan_of(spark, sf_dir, "h21_waiting_suppliers")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_tpch_h09_partsupp_pushdown_all_broadcast(spark, sf_dir):
    """h09: the part filter is pushed into the derived-partsupp build
    (LeftSemi on the part keys), shrinking it enough that every join in
    the 6-join profit plan is a broadcast hash join — the lineitem fact
    never shuffles."""
    plan = plan_of(spark, sf_dir, "h09_product_profit")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "LeftSemi" in plan  # the pushed-down part-key restriction
    assert plan.count("BroadcastHashJoin") >= 5


# --- forced-broadcast audit -------------------------------------------
# Scale-growing relations (orders ≈ lineitem/4, customer, supplier, part,
# and anything derived from lineitem) must NEVER carry an explicit
# broadcast hint: the hint disables AQE's runtime size check, so a plan
# that works at sf0.1 hard-fails at 100 TB when the side outgrows the
# 8 GB broadcast-relation cap. Hints are allowed only on (a) subtrees
# whose base relations are all fixed-size (nation: 25 rows, region: 5),
# or (b) 1-row global aggregates (scalar subqueries).

_SCALE_TABLE_MARKERS = ("o_orderkey", "c_custkey", "l_orderkey", "p_partkey", "s_suppkey")


def _indent_of(line: str) -> int:
    stripped = line.lstrip(" :+-")
    return len(line) - len(stripped)


def _hint_subtrees(analyzed: str):
    """Yield the subtree text under each ResolvedHint in a logical-plan
    tree string (children are the following lines with deeper indent)."""
    lines = analyzed.splitlines()
    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        depth = _indent_of(line)
        subtree = []
        for child in lines[i + 1:]:
            if child.strip() and _indent_of(child) <= depth:
                break
            subtree.append(child)
        yield "\n".join(subtree)


def _scans_scale_table(subtree: str) -> bool:
    relation_lines = [l for l in subtree.splitlines() if "Relation" in l]
    return any(m in l for l in relation_lines for m in _SCALE_TABLE_MARKERS)


def _is_global_aggregate_root(subtree: str) -> bool:
    """True if the hint's direct child is an ungrouped (1-row) Aggregate:
    grouped aggregates print `Aggregate [keys], [exprs]`, global ones
    `Aggregate [exprs]` — a single bracket group."""
    import re

    first = next((l for l in subtree.splitlines() if l.strip()), "")
    node = first.lstrip(" :+-")
    return bool(re.match(r"Aggregate \[[^\[\]]*\]$", node))


def test_tpch_no_forced_broadcast_of_scale_tables(spark, sf_dir):
    """Every explicit broadcast hint across the h-suite sits on a
    fixed-size relation (nation/region) or a 1-row scalar aggregate —
    never on orders/customer/supplier/part/lineitem-derived key lists."""
    names = [n for n in all_queries() if n.startswith("h")]
    assert len(names) == 22
    offending = []
    for name in names:
        df = all_queries()[name](spark, sf_dir)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        for subtree in _hint_subtrees(analyzed):
            if _scans_scale_table(subtree) and not _is_global_aggregate_root(subtree):
                offending.append(name)
    assert offending == [], f"scale-growing broadcast hints in: {sorted(set(offending))}"


def test_q_suite_no_raw_scale_table_broadcast(spark, sf_dir):
    """Same audit over the whole q-suite, with the slightly looser rule
    that fits its shapes: a broadcast hint whose subtree scans a scale
    table must at least sit above an Aggregate (reduced relation —
    e.g. WITH FILL's size-guarded data side), never on a raw/filtered
    base-table scan."""
    names = [n for n in all_queries() if n.startswith("q")]
    offending = []
    for name in names:
        df = all_queries()[name](spark, sf_dir)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        for subtree in _hint_subtrees(analyzed):
            if _scans_scale_table(subtree) and "Aggregate" not in subtree:
                offending.append(name)
    assert offending == [], f"raw scale-table broadcast hints in: {sorted(set(offending))}"


def test_paste_join_no_single_partition_exchange(spark):
    """J8 scale property: PASTE JOIN's global positional index is the
    two-pass distributed form — per-partition numbering + broadcast
    offsets — NOT a global Window.orderBy, so the plan must carry no
    Exchange SinglePartition and every row_number window must be
    partitioned (by __pid)."""
    from pyspark.sql import functions as F

    from otus_clickhouse_spark.operators.joins import paste_join, paste_zip

    a = spark.range(0, 10_000, 1, 8).select(F.col("id").alias("l"))
    b = spark.range(0, 10_000, 1, 8).select((9_999 - F.col("id")).alias("r"))
    out = paste_join(a, b, ["l"], [F.col("r").desc()])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(__pid" in plan  # partition-local numbering
    # and it's still a correct zip: ascending l meets descending r
    rows = out.orderBy("l").limit(3).collect()
    assert [(x.l, x.r) for x in rows] == [(0, 9999), (1, 9998), (2, 9997)]

    z = paste_zip(a.orderBy("l"), b.orderBy(F.col("r").desc()))
    zplan = z._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in zplan
    assert "Coalesce 1" not in zplan
    zrows = z.orderBy("l").limit(2).collect()
    assert [(x.l, x.r) for x in zrows] == [(0, 9999), (1, 9998)]
