"""Behavioral-analytics queries: ClickHouse's parametric-aggregate
family (windowFunnel / sequenceMatch / retention / topK / sumMap /
entropy / deltaSum / simpleLinearRegression) over the events table.

The two-paren parametric syntax is introduced by the course at
lectures/lecture_06.md:57-59 (A13); the individual function semantics
follow the public ClickHouse documentation. Implementations live in
operators/behavioral.py — compositions of built-in Spark operators,
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from otus_clickhouse_spark.operators.behavioral import (
    delta_sum,
    entropy,
    retention,
    sequence_match,
    sum_map,
    top_k,
    window_funnel,
)
from otus_clickhouse_spark.queries import query, t

_FUNNEL_CONDS = [
    "event_type = 'view'",
    "event_type = 'click'",
    "event_type = 'purchase'",
]


@query(
    "q75_window_funnel",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    fv AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    fc AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    fp AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    -- staged + window-filtered pair CTE: the one-shot triple self-join
    -- let the planner materialize the full per-user event product
    -- before filtering (79 GB spill at sf1); vc is window-bounded and
    -- tiny, so the purchase step joins against almost nothing
    vc AS MATERIALIZED (
      SELECT fv.user_id, fv.ts AS vts, fc.ts AS cts
      FROM fv JOIN fc USING (user_id)
      WHERE fc.ts > fv.ts AND epoch(fc.ts - fv.ts) <= 3600
    ),
    l2 AS (SELECT DISTINCT user_id FROM vc),
    l3 AS (
      SELECT DISTINCT vc.user_id FROM vc JOIN fp USING (user_id)
      WHERE fp.ts > vc.cts AND epoch(fp.ts - vc.vts) <= 3600
    ),
    lv AS (
      SELECT u.user_id,
             CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                  WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                  ELSE 0 END AS level
      FROM u
    )
    SELECT level, count(*) AS n_users FROM lv GROUP BY level
    """,
)
def q75_window_funnel(spark, sf_dir):
    """windowFunnel(3600)(ts, view, click, purchase): funnel-level
    distribution. Spark side is the exact greedy chain machine (one
    shuffle on user_id); the oracle is the equivalent exists-chain
    formulation, which the greedy max-start state provably matches."""
    lvl = window_funnel(
        t(spark, sf_dir, "events"), "user_id", "ts", _FUNNEL_CONDS, 3600
    )
    return lvl.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q76_retention",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS m1,
             max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS m2,
             max(CASE WHEN event_type = 'error' AND value > 250 THEN 1 ELSE 0 END) AS m3
      FROM events GROUP BY user_id
    )
    SELECT CAST(sum(m1) AS BIGINT) AS r1,
           CAST(sum(least(m1, m2)) AS BIGINT) AS r2,
           CAST(sum(least(m1, m3)) AS BIGINT) AS r3
    FROM per_user
    """,
)
def q76_retention(spark, sf_dir):
    """retention(signup, big purchase, big error): cohort counts.
    r1 = users who signed up; r_i = those who also did step i."""
    r = retention(
        t(spark, sf_dir, "events"),
        "user_id",
        [
            "event_type = 'signup'",
            "event_type = 'purchase' AND value > 150",
            "event_type = 'error' AND value > 250",
        ],
    )
    return r.agg(
        F.sum("r1").alias("r1"), F.sum("r2").alias("r2"), F.sum("r3").alias("r3")
    )


@query(
    "q77_sequence_match",
    oracle="""
    WITH m1 AS MATERIALIZED (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    -- greedy-min chain (exact for unwindowed existential sequences):
    -- earliest view after the first signup, then any qualifying
    -- purchase after that — linear aggregations instead of the
    -- triple self-join that spilled at sf1
    m2 AS MATERIALIZED (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN m1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > m1.t1 GROUP BY e.user_id
    ),
    m AS (
      SELECT DISTINCT e.user_id FROM events e JOIN m2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.value > 300 AND e.ts > m2.t2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           (SELECT count(DISTINCT user_id) FROM events) AS n_users
    FROM m
    """,
)
def q77_sequence_match(spark, sf_dir):
    """sequenceMatch('(?1).*(?2).*(?3)')(ts, signup, view, big purchase):
    how many users ever did the ordered sequence."""
    m = sequence_match(
        t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        [
            "event_type = 'signup'",
            "event_type = 'view'",
            "event_type = 'purchase' AND value > 300",
        ],
    )
    return m.agg(
        F.sum(F.col("matched").cast("bigint")).alias("n_matched"),
        F.count(F.lit(1)).alias("n_users"),
    )


@query(
    "q78_topk",
    oracle="""
    WITH counts AS (
      SELECT user_id % 5 AS bucket, event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT bucket, event_type, cnt,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY cnt DESC, event_type ASC) AS rnk
      FROM counts
    )
    SELECT bucket, event_type, cnt, rnk FROM ranked WHERE rnk <= 2
    """,
)
def q78_topk(spark, sf_dir):
    """topK(2)(event_type) per user bucket — exact two-level agg with
    deterministic count-desc/value-asc tie-break."""
    ev = t(spark, sf_dir, "events").withColumn(
        "bucket", F.col("user_id") % 5
    )
    return top_k(ev, "event_type", 2, group_cols=["bucket"])


@query(
    "q79_sum_map",
    oracle="""
    WITH per_key AS (
      SELECT user_id % 4 AS bucket, event_type, sum(value) AS s
      FROM events GROUP BY 1, 2
    )
    SELECT bucket,
           string_agg(event_type, ',' ORDER BY event_type) AS map_keys,
           string_agg(CAST(CAST(round(s, 2) AS DECIMAL(18,2)) AS VARCHAR), ',' ORDER BY event_type) AS map_vals
    FROM per_key GROUP BY bucket
    """,
)
def q79_sum_map(spark, sf_dir):
    """sumMap(event_type -> value) per user bucket; arrays emitted as
    joined strings so the driver's canonicalizer can hash them."""
    ev = t(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 4)
    sm = sum_map(ev, ["bucket"], "event_type", "value")
    return sm.select(
        "bucket",
        F.array_join(F.col("keys"), ",").alias("map_keys"),
        F.array_join(
            F.expr("transform(vals, v -> CAST(CAST(round(v, 2) AS DECIMAL(18,2)) AS STRING))"), ","
        ).alias("map_vals"),
    )


@query(
    "q80_entropy",
    oracle="""
    WITH counts AS (
      SELECT user_id % 4 AS bucket, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT bucket,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
    FROM counts GROUP BY bucket
    """,
)
def q80_entropy(spark, sf_dir):
    """entropy(event_type) per user bucket (Shannon, log2)."""
    ev = t(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 4)
    e = entropy(ev, "event_type", ["bucket"])
    return e.select("bucket", F.round("entropy", 4).alias("entropy"))


@query(
    "q81_linreg",
    oracle="""
    WITH e AS (
      SELECT value,
             (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 3600000000.0 AS x
      FROM events
    )
    SELECT round(regr_slope(value, x), 4) AS slope,
           round(regr_intercept(value, x), 4) AS intercept,
           round(corr(value, x), 4) AS r
    FROM e
    """,
)
def q81_linreg(spark, sf_dir):
    """simpleLinearRegression(x, y) + corr — Spark's regr_* builtins
    (value over hours since 2024-01-01; the small-magnitude x keeps
    the rounded fp comparison stable)."""
    origin = "unix_micros(TIMESTAMP '2024-01-01 00:00:00')"
    ev = t(spark, sf_dir, "events").withColumn(
        "x",
        F.expr(f"(unix_micros(CAST(ts AS TIMESTAMP)) - {origin}) / 3600000000.0"),
    )
    return ev.agg(
        F.round(F.regr_slope(F.col("value"), F.col("x")), 4).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), F.col("x")), 4).alias("intercept"),
        F.round(F.corr(F.col("value"), F.col("x")), 4).alias("r"),
    )


@query(
    "q82_delta_sum",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             sum(CASE WHEN prev IS NOT NULL AND value > prev
                      THEN value - prev ELSE 0 END) AS ds
      FROM d GROUP BY user_id
    )
    SELECT round(sum(ds), 2) AS total_delta, count(*) AS n_users FROM per_user
    """,
)
def q82_delta_sum(spark, sf_dir):
    """deltaSum(value) in ts order per user (sum of positive
    increments), rolled up to one global row."""
    ds = delta_sum(t(spark, sf_dir, "events"), "user_id", "ts", "value")
    return ds.agg(
        F.round(F.sum("delta_sum"), 2).alias("total_delta"),
        F.count(F.lit(1)).alias("n_users"),
    )


@query(
    "q83_sequence_count",
    oracle="""
    WITH RECURSIVE ev AS MATERIALIZED (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    scan AS (
      SELECT user_id, 0 AS rn, false AS seen_a, 0 AS m
      FROM (SELECT DISTINCT user_id FROM ev)
      UNION ALL
      SELECT e.user_id, e.rn,
             CASE WHEN e.event_type = 'purchase' AND s.seen_a THEN false
                  WHEN e.event_type = 'signup' THEN true
                  ELSE s.seen_a END,
             s.m + CASE WHEN e.event_type = 'purchase' AND s.seen_a
                        THEN 1 ELSE 0 END
      FROM scan s JOIN ev e ON e.user_id = s.user_id AND e.rn = s.rn + 1
    ),
    final AS (
      SELECT user_id, max_by(m, rn) AS n_matches FROM scan GROUP BY user_id
    )
    SELECT CAST(sum(n_matches) AS BIGINT) AS total_matches,
           CAST(count(*) FILTER (n_matches > 0) AS BIGINT) AS users_matched
    FROM final
    """,
)
def q83_sequence_count(spark, sf_dir):
    """sequenceCount('(?1).*(?2)')(ts, signup, purchase): non-overlapping
    signup→purchase chains per user (search resumes after each match —
    the ClickHouse scan semantics), rolled up. The oracle replays the
    same left-to-right scan as a recursive CTE."""
    from otus_clickhouse_spark.operators.behavioral import sequence_count

    sc = sequence_count(
        t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        ["event_type = 'signup'", "event_type = 'purchase'"],
    )
    return sc.agg(
        F.sum("n_matches").alias("total_matches"),
        F.sum((F.col("n_matches") > 0).cast("bigint")).alias("users_matched"),
    )


@query(
    "q84_histogram",
    oracle="""
    WITH rng AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi
      FROM events GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type,
             least(greatest(CAST(floor((e.value - r.lo) / ((r.hi - r.lo) / 8))
                                 AS INT), 0), 7) AS bin,
             r.lo, r.hi
      FROM events e JOIN rng r USING (event_type)
    )
    SELECT event_type, CAST(bin AS BIGINT) AS bin,
           lo + bin * (hi - lo) / 8 AS lo,
           lo + (bin + 1) * (hi - lo) / 8 AS hi,
           count(*) AS height
    FROM binned GROUP BY event_type, bin, lo, hi
    """,
)
def q84_histogram(spark, sf_dir):
    """histogram(8)(value) per event type — deterministic equi-width
    variant of ClickHouse's adaptive histogram (operators.behavioral)."""
    from otus_clickhouse_spark.operators.behavioral import histogram

    return histogram(
        t(spark, sf_dir, "events"), "value", 8, group_cols=["event_type"]
    )


@query(
    "q85_funnel_sql",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    fv AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    fc AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    fp AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    -- staged + window-filtered pair CTE: the one-shot triple self-join
    -- let the planner materialize the full per-user event product
    -- before filtering (79 GB spill at sf1); vc is window-bounded and
    -- tiny, so the purchase step joins against almost nothing
    vc AS MATERIALIZED (
      SELECT fv.user_id, fv.ts AS vts, fc.ts AS cts
      FROM fv JOIN fc USING (user_id)
      WHERE fc.ts > fv.ts AND epoch(fc.ts - fv.ts) <= 3600
    ),
    l2 AS (SELECT DISTINCT user_id FROM vc),
    l3 AS (
      SELECT DISTINCT vc.user_id FROM vc JOIN fp USING (user_id)
      WHERE fp.ts > vc.cts AND epoch(fp.ts - vc.vts) <= 3600
    ),
    lv AS (
      SELECT u.user_id,
             CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                  WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                  ELSE 0 END AS level
      FROM u
    )
    SELECT level, count(*) AS n_users FROM lv GROUP BY level
    """,
)
def q85_funnel_sql(spark, sf_dir):
    """The q75 funnel through the RAW SQL dialect route: the two-paren
    windowFunnel syntax is rewritten by the dialect into the same
    aggregate() chain machine, so this locks the SQL surface itself
    under the driver gate (pytest covers it; this makes it a green
    CORRECTNESS row too)."""
    eng = _mini_engine_events(spark, sf_dir)
    return eng.sql(
        "SELECT level, count(*) AS n_users FROM ("
        "  SELECT user_id, windowFunnel(3600)(ts, event_type = 'view', "
        "         event_type = 'click', event_type = 'purchase') AS level "
        "  FROM events GROUP BY user_id) GROUP BY level"
    )


def _mini_engine_events(spark, sf_dir):
    import os

    from otus_clickhouse_spark.engine import Engine, TableDef

    eng = Engine(spark)
    eng.register_table(
        TableDef(name="events", path=os.path.join(sf_dir, "events.parquet"))
    )
    return eng


@query(
    "q86_funnel_conversion",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    fv AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    fc AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    fp AS MATERIALIZED (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    -- staged + window-filtered pair CTE: the one-shot triple self-join
    -- let the planner materialize the full per-user event product
    -- before filtering (79 GB spill at sf1); vc is window-bounded and
    -- tiny, so the purchase step joins against almost nothing
    vc AS MATERIALIZED (
      SELECT fv.user_id, fv.ts AS vts, fc.ts AS cts
      FROM fv JOIN fc USING (user_id)
      WHERE fc.ts > fv.ts AND epoch(fc.ts - fv.ts) <= 3600
    ),
    l2 AS (SELECT DISTINCT user_id FROM vc),
    l3 AS (
      SELECT DISTINCT vc.user_id FROM vc JOIN fp USING (user_id)
      WHERE fp.ts > vc.cts AND epoch(fp.ts - vc.vts) <= 3600
    ),
    reach AS (
      SELECT 1 AS step, (SELECT count(*) FROM l1) AS reached,
             (SELECT count(*) FROM u) AS prev
      UNION ALL
      SELECT 2, (SELECT count(*) FROM l2), (SELECT count(*) FROM l1)
      UNION ALL
      SELECT 3, (SELECT count(*) FROM l3), (SELECT count(*) FROM l2)
    )
    SELECT step, CAST(reached AS BIGINT) AS reached,
           round(reached / prev, 4) AS conversion
    FROM reach
    """,
)
def q86_funnel_conversion(spark, sf_dir):
    """Funnel conversion report: users reaching each step and the
    step-over-step conversion rate — the composite a product-analytics
    user derives from windowFunnel. One funnel pass + a 3-row window."""
    from pyspark.sql import Window

    lvl = window_funnel(
        t(spark, sf_dir, "events"), "user_id", "ts", _FUNNEL_CONDS, 3600
    ).persist()
    total = lvl.count()  # also materializes lvl for the reach join
    steps = spark.range(1, len(_FUNNEL_CONDS) + 1).select(
        F.col("id").cast("int").alias("step")
    )
    reach = (
        steps.join(lvl, F.col("level") >= F.col("step"), "left")
        .groupBy("step")
        .agg(F.count("user_id").alias("reached"))
    )
    w = Window.orderBy("step")
    return (
        reach.withColumn("prev", F.lag("reached", 1, total).over(w))
        .select(
            "step",
            "reached",
            F.round(F.col("reached") / F.col("prev"), 4).alias("conversion"),
        )
    )
