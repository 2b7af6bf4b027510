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


# Unpartitioned-window allowlist: each entry is a query whose plan
# contains Window operators with an EMPTY partition spec over an input
# that is CONSTANT-BOUNDED by construction — the single task such a
# window funnels through sees O(k) rows regardless of corpus size.
# name -> (max allowed count, why the input is bounded).
UNPARTITIONED_WINDOW_OK = {
    "q72_fill_interpolate_sql": (1, "WITH FILL grid post-agg: rows = fill range (1..8)"),
    "q86_funnel_conversion": (1, "step ladder: rows = number of funnel steps (3)"),
    "x21_mixture_weights": (2, "strata windows post-agg: rows = number of strata"),
    "x25_vocab_build": (1, "rank+coverage over salted-top-N survivors: <= salts*top_n rows"),
    "x27_bm25_topk": (1, "rank AFTER LIMIT: rows <= k"),
    "x36_budget_select": (1, "histogram cumsum: <= `buckets` rows by construction"),
    "x49_temperature_mixture": (2, "per-source weight table: rows = number of sources"),
    "x50_passage_retrieval": (1, "rank AFTER LIMIT: rows <= k"),
    "x52_zipf_diagnostic": (1, "regression input AFTER LIMIT 1000 (TakeOrderedAndProject)"),
    "x86_ngram_novelty": (1, "cumulative over the #buckets-row novelty curve (10 rows)"),
    "x91_neyman_allocation": (1, "N*sigma normalization over the #strata aggregate (~20 rows)"),
    "x95_hybrid_rrf": (2, "rank AFTER LIMIT in the BM25 branch and after the bounded 2x20-row fusion"),
    "x89_quality_deciles": (1, "cumulative walk over the global 4dp-quality histogram (<= ~10k rows)"),
    "x106_gate_disagreement": (1, "global-median cumulative walk over the 4dp avg_nll value histogram (range-bounded, never row-bounded; the literal _hist_median key folds away)"),
    "x110_vocab_oov": (1, "vocab_build rank+coverage over salted-top-N survivors (<= salts*top_n rows), same bound as x25"),
    "x114_activity_concentration": (2, "rank cumulative over the (activity value, n_users) histogram — distinct-value-bounded; x2 consumers (gini terms + top-decile overlap)"),
    "x115_quality_ks_drift": (1, "global cdf cumulative over the distinct-4dp-quality histogram (range-bounded)"),
}


def test_no_unpartitioned_window_over_unbounded_input(spark, sf_dir):
    """The x25 regression class (r6 verdict ask #3): a Window with an
    empty partition spec moves ALL input rows to one task — fine over a
    constant-bounded input (post-LIMIT rank, a histogram, a strata
    table), fatal over anything corpus-sized. Every registry query's
    optimized plan is walked for unpartitioned Window operators; any
    query not on the justified allowlist fails, and allowlist entries
    that stop triggering fail too (the list can't go stale)."""
    from otus_clickhouse_spark.queries import all_queries

    def iter_nodes(p):
        yield p
        it = p.children().iterator()
        while it.hasNext():
            yield from iter_nodes(it.next())

    offenders, seen = {}, {}
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan()
        n = sum(
            1
            for node in iter_nodes(opt)
            if node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        )
        if not n:
            continue
        seen[name] = n
        allowed = UNPARTITIONED_WINDOW_OK.get(name, (0, ""))[0]
        if n > allowed:
            offenders[name] = n
    assert not offenders, (
        f"unpartitioned Window over potentially unbounded input: {offenders} — "
        "repartition the window or justify a constant bound in the allowlist"
    )
    stale = set(UNPARTITIONED_WINDOW_OK) - set(seen)
    assert not stale, f"allowlist entries no longer triggering (remove them): {stale}"


# Known low-cardinality columns in the driver tables: ~20 distinct
# sources, a handful of langs/labels. A window partitioned ONLY by such
# keys is the unpartitioned-window scale-killer wearing a hat — every
# row of a key funnels into ONE task, which then sorts it (a multi-TB
# single-task sort for a big source at 100 TB).
LOW_CARD_COLS = {"source", "lang", "label", "predicted"}

# Allowlist: queries whose low-card-partitioned windows run over inputs
# that are BOUNDED by construction, independent of corpus size. Counts
# include logical-plan subtree duplication (an un-reused CTE appears
# once per consumer). name -> (max allowed count, why bounded).
LOW_CARD_WINDOW_OK = {
    "x47_curation_funnel": (
        3,
        "budget histogram cumsum (<=10k 4dp-quality buckets/source, x2 "
        "consumers) + boundary-bucket tie-break (rows tied at ONE quality)",
    ),
    "x115_quality_ks_drift": (
        1,
        "per-source cdf cumulative over the (#sources x distinct-4dp-quality) "
        "grid — histogram-bounded by construction, never corpus rows",
    ),
    "x61_domain_cap": (
        1,
        "phase-2 exact window over salted-top-N survivors: <= salts*cap rows",
    ),
    "x74_mad_outliers": (
        4,
        "_hist_median cumulative walks over (source, value) histograms "
        "(distinct-length-bounded; med + MAD, x2 consumers each)",
    ),
    "x75_quality_quantile_gate": (
        3,
        "quantile histogram cumsum (<=10k buckets/source, x2 consumers) "
        "+ boundary-bucket tie-break (rows tied at ONE quality)",
    ),
    "x83_length_quantiles": (
        1,
        "histogram cumulative walk over (source, n_chars) rows — "
        "distinct-length-bounded, never corpus-sized",
    ),
}


def test_no_low_cardinality_window_over_unbounded_input(spark, sf_dir):
    """r8 verdict ask #3: the unpartitioned-window guard missed windows
    partitioned by a ~20-ary key (x75's percent_rank, x47's budget
    cumsum — fixed this round via histogram thresholds). Walk every
    registry query's optimized plan for Window operators whose
    partition spec references ONLY known low-cardinality columns; any
    query off the justified-bounded allowlist fails, and allowlist
    entries that stop triggering fail too (the list can't go stale)."""
    import re

    from otus_clickhouse_spark.queries import all_queries

    def iter_nodes(p):
        yield p
        it = p.children().iterator()
        while it.hasNext():
            yield from iter_nodes(it.next())

    offenders, seen = {}, {}
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan()
        n = 0
        for node in iter_nodes(opt):
            if node.getClass().getSimpleName() != "Window":
                continue
            ps = node.partitionSpec()
            if ps.isEmpty():
                continue  # the unpartitioned guard owns that case
            refs = set(re.findall(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", ps.toString()))
            if refs and refs <= LOW_CARD_COLS:
                n += 1
        if not n:
            continue
        seen[name] = n
        allowed = LOW_CARD_WINDOW_OK.get(name, (0, ""))[0]
        if n > allowed:
            offenders[name] = n
    assert not offenders, (
        f"window partitioned only by low-cardinality keys over potentially "
        f"corpus-sized input: {offenders} — reduce to a histogram/two-phase "
        f"form or justify a constant bound in the allowlist"
    )
    stale = set(LOW_CARD_WINDOW_OK) - set(seen)
    assert not stale, f"allowlist entries no longer triggering (remove them): {stale}"


def test_registry_codegen_compiles(spark, sf_dir):
    """Codegen-health guard (r7 verdict ask #2): the PQ literal
    transport's registry plans FAILED whole-stage codegen (janino
    InternalCompilerException, 3.5–4.9 MiB task binaries) and silently
    ran interpreted — a 12–15× slowdown invisible to every correctness
    check (x60 43.5 s vs its bit-identical HOF twin at 3.6 s, sf0.01).
    Execute every registry query with ``spark.sql.codegen.fallback=
    false`` so a compile failure RAISES instead of interpreting; the
    noop sink forces full execution without driver-collect cost. (The
    other silent-fallback channel — bytecode above
    ``spark.sql.codegen.hugeMethodLimit`` — downgrades before the
    compile step and cannot be trapped this way; janino errors are the
    observed failure class.)"""
    from otus_clickhouse_spark.queries import all_queries

    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        failures = {}
        for name, fn in sorted(all_queries().items()):
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # noqa: BLE001 — report every offender
                failures[name] = str(exc).splitlines()[0][:160]
            finally:
                spark.catalog.clearCache()
        assert not failures, (
            f"whole-stage codegen compile failures (these queries run "
            f"interpreted at scale): {failures}"
        )
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
