"""Whole-registry plan sweep: every driver-contract query stays JVM-side.

The scale contract (README "Scale design") says hot paths never drop
into Python row evaluation — ClickHouse-named functions are inlined
Catalyst expressions, pipeline operators are built-in SQL exprs, and
Pandas UDFs appear only in the multimodal decode stubs (which are not
part of the query registry). This sweep builds every ``queries()``
entry and asserts its PHYSICAL plan contains no Python-eval operator,
so a regression that silently de-optimizes an operator (e.g. a helper
becoming a row-at-a-time UDF) fails CI rather than surfacing as a 10×
slowdown at 100 TB.
"""

PYTHON_EVAL_MARKS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)

# The ONE designed Python boundary: multimodal byte decode is Arrow-
# batched mapInPandas by construction (numpy codec work cannot be a SQL
# expression). Everything downstream of the decode in that query —
# banding, Hamming, grouping — must still be JVM-side, which the
# per-mark allowlist enforces.
PYTHON_ALLOWED = {"x34_media_dedup": {"MapInPandas"}}


def test_all_queries_plan_jvm_side(spark, sf_dir):
    from otus_clickhouse_spark.queries import all_queries

    offenders = {}
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        marks = [m for m in PYTHON_EVAL_MARKS if m in plan]
        marks = [m for m in marks if m not in PYTHON_ALLOWED.get(name, set())]
        if marks:
            offenders[name] = marks
    assert not offenders, f"queries fell back to Python eval: {offenders}"


def test_no_collect_list_in_global_agg(spark, sf_dir):
    """No registry query may collect the whole input into one aggregation
    group: collect_list/collect_set inside a zero-key (global) aggregate
    is a driver-OOM at 100 TB. Keyed collect_list (bounded groups) is
    allowed."""
    from otus_clickhouse_spark.queries import all_queries

    offenders = {}
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        for line in opt.splitlines():
            stripped = line.strip()
            if not stripped.startswith("Aggregate ["):
                continue
            # "Aggregate [groupkeys], [aggexprs]" — a global agg has an
            # empty grouping list: "Aggregate [aggexprs]" (one bracket
            # group) or "Aggregate [], [...]".
            grouped = stripped.startswith("Aggregate [") and "], [" in stripped and not stripped.startswith("Aggregate [], [")
            if not grouped and ("collect_list" in stripped or "collect_set" in stripped):
                offenders.setdefault(name, []).append(stripped[:120])
    assert not offenders, f"global-agg collect_list/set found: {offenders}"


def test_no_complex_columns_in_registry_output(spark, sf_dir):
    """Driver-contract queries must emit only scalar columns: the
    correctness harness canonicalizes results via pandas hashing, which
    cannot hash list/struct/map cells (the round-1 q16 failure). Arrays
    are fine internally — join them to strings at the output boundary."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from otus_clickhouse_spark.queries import all_queries

    offenders = {}
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar output columns: {offenders}"
