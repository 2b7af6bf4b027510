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


def test_all_queries_plan_jvm_side(spark, sf_dir):
    from otus_clickhouse_spark.queries import all_queries

    offenders = {}
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        marks = [m for m in PYTHON_EVAL_MARKS if m in plan]
        if marks:
            offenders[name] = marks
    assert not offenders, f"queries fell back to Python eval: {offenders}"
