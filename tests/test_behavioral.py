"""Behavioral-analytics aggregates (operators/behavioral.py):
windowFunnel / sequenceMatch / retention / topK / sumMap / entropy /
deltaSum — hand-computed golden cases + the SQL dialect forms.

Parametric-aggregate syntax class: lectures/lecture_06.md:57-59 (A13).
"""

import math

import pytest

from otus_clickhouse_spark.operators.behavioral import (
    delta_sum,
    entropy,
    retention,
    sequence_match,
    sum_map,
    top_k,
    window_funnel,
)


def _events(spark, rows):
    """rows: (user, ts_second_offset, etype)"""
    return spark.createDataFrame(
        rows, "user_id int, s int, event_type string"
    ).selectExpr(
        "user_id",
        "timestampadd(SECOND, s, TIMESTAMP '2024-01-01 00:00:00') AS ts",
        "event_type",
    )


CONDS = ["event_type = 'A'", "event_type = 'B'", "event_type = 'C'"]


def _levels(df):
    return {r["user_id"]: r["level"] for r in df.collect()}


def test_window_funnel_basic(spark):
    ev = _events(
        spark,
        [
            # u1: full in-order chain, 30s apart → level 3
            (1, 0, "A"), (1, 30, "B"), (1, 60, "C"),
            # u2: B before A, no B after A → level 1
            (2, 0, "B"), (2, 30, "A"), (2, 60, "C"),
            # u3: only C → level 0
            (3, 0, "C"),
        ],
    )
    lv = _levels(window_funnel(ev, "user_id", "ts", CONDS, 3600))
    assert lv == {1: 3, 2: 1, 3: 0}


def test_window_funnel_window_cutoff(spark):
    # A at t=0, B at t=50: chain start is A(0); C at t=120 exceeds a
    # 100-second window from the chain start → level 2. A second A at
    # t=40 restarts a later chain: A(40), B(50), C(120) is within 100s
    # → level 3. The greedy max-start state must find the later chain.
    ev = _events(spark, [(1, 0, "A"), (1, 50, "B"), (1, 120, "C")])
    assert _levels(window_funnel(ev, "user_id", "ts", CONDS, 100)) == {1: 2}

    ev2 = _events(
        spark, [(2, 0, "A"), (2, 40, "A"), (2, 50, "B"), (2, 120, "C")]
    )
    assert _levels(window_funnel(ev2, "user_id", "ts", CONDS, 100)) == {2: 3}


def test_window_funnel_single_event_cannot_double_advance(spark):
    # One event matching both cond1 and cond2 must not produce level 2
    # by itself (all levels update from the pre-event state).
    ev = _events(spark, [(1, 0, "A")])
    both = ["event_type = 'A'", "event_type = 'A'"]
    assert _levels(window_funnel(ev, "user_id", "ts", both, 3600)) == {1: 1}
    # …but a second A event does complete the 2-level chain
    ev2 = _events(spark, [(2, 0, "A"), (2, 10, "A")])
    assert _levels(window_funnel(ev2, "user_id", "ts", both, 3600)) == {2: 2}


def test_sequence_match(spark):
    ev = _events(
        spark,
        [
            (1, 0, "A"), (1, 5000, "B"), (1, 10000, "C"),  # far apart, still matches
            (2, 0, "C"), (2, 30, "B"), (2, 60, "A"),       # reversed → no
        ],
    )
    got = {r["user_id"]: r["matched"] for r in
           sequence_match(ev, "user_id", "ts", CONDS).collect()}
    assert got == {1: True, 2: False}


def test_retention(spark):
    ev = _events(
        spark,
        [
            (1, 0, "A"), (1, 10, "B"), (1, 20, "C"),  # 1,1,1
            (2, 0, "B"), (2, 10, "C"),                # 0,0,0 (no A → all gated off)
            (3, 0, "A"), (3, 10, "C"),                # 1,0,1
        ],
    )
    got = {r["user_id"]: (r["r1"], r["r2"], r["r3"]) for r in
           retention(ev, "user_id", CONDS).collect()}
    assert got == {1: (1, 1, 1), 2: (0, 0, 0), 3: (1, 0, 1)}


def test_top_k_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("x",)] * 3 + [("b",)] * 2 + [("a",)] * 2 + [("z",)],
        "v string",
    )
    rows = [(r["v"], r["cnt"], r["rnk"]) for r in top_k(df, "v", 3).collect()]
    assert rows == [("x", 3, 1), ("a", 2, 2), ("b", 2, 3)]


def test_sum_map(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0), (1, "a", 3.0), (2, "c", 5.0)],
        "g int, k string, v double",
    )
    got = {r["g"]: (r["keys"], r["vals"]) for r in
           sum_map(df, ["g"], "k", "v").collect()}
    assert got == {1: (["a", "b"], [4.0, 2.0]), 2: (["c"], [5.0])}


def test_entropy(spark):
    # 2 of 'a', 2 of 'b' → exactly 1 bit; 4 of 'a' → 0 bits
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "a")],
        "g int, v string",
    )
    got = {r["g"]: r["entropy"] for r in entropy(df, "v", ["g"]).collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)


def test_delta_sum(spark):
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 1, 13.0), (1, 2, 11.0), (1, 3, 14.0)],
        "g int, ts int, v double",
    )
    # increments: +3, (down), +3 → 6
    got = {r["g"]: r["delta_sum"] for r in delta_sum(df, "g", "ts", "v").collect()}
    assert got[1] == pytest.approx(6.0)


# ------------------------------------------------------------------ SQL forms
def test_window_funnel_sql(engine, spark):
    ev = _events(
        spark,
        [(1, 0, "A"), (1, 30, "B"), (1, 60, "C"), (2, 0, "B"), (2, 30, "A")],
    )
    ev.createOrReplaceTempView("funnel_ev")
    out = engine.sql(
        "SELECT user_id, windowFunnel(3600)(ts, event_type = 'A', "
        "event_type = 'B', event_type = 'C') AS lvl "
        "FROM funnel_ev GROUP BY user_id"
    )
    assert {r["user_id"]: r["lvl"] for r in out.collect()} == {1: 3, 2: 1}


def test_sequence_match_sql(engine, spark):
    ev = _events(spark, [(1, 0, "A"), (1, 900, "C"), (2, 0, "C"), (2, 30, "A")])
    ev.createOrReplaceTempView("seq_ev")
    out = engine.sql(
        "SELECT user_id, sequenceMatch('(?1).*(?2)')(ts, "
        "event_type = 'A', event_type = 'C') AS m "
        "FROM seq_ev GROUP BY user_id"
    )
    assert {r["user_id"]: r["m"] for r in out.collect()} == {1: 1, 2: 0}


def test_retention_sql(engine, spark):
    ev = _events(spark, [(1, 0, "A"), (1, 10, "C"), (2, 0, "C")])
    ev.createOrReplaceTempView("ret_ev")
    out = engine.sql(
        "SELECT user_id, retention(event_type = 'A', event_type = 'B', "
        "event_type = 'C') AS r FROM ret_ev GROUP BY user_id"
    )
    assert {r["user_id"]: list(r["r"]) for r in out.collect()} == {
        1: [1, 0, 1],
        2: [0, 0, 0],
    }


def test_topk_sql(engine, spark):
    df = spark.createDataFrame(
        [("x",)] * 3 + [("b",)] * 2 + [("a",)] * 2 + [("z",)], "v string"
    )
    df.createOrReplaceTempView("topk_t")
    out = engine.sql("SELECT topK(3)(v) AS top FROM topk_t")
    assert list(out.collect()[0]["top"]) == ["x", "a", "b"]


def test_sequence_count(spark):
    # A B A B A → two non-overlapping (A,B) matches; trailing A unused
    ev = _events(
        spark,
        [(1, 0, "A"), (1, 10, "B"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
         (2, 0, "B"), (2, 10, "A")],  # B before A → zero matches
    )
    from otus_clickhouse_spark.operators.behavioral import sequence_count

    got = {r["user_id"]: r["n_matches"] for r in
           sequence_count(ev, "user_id", "ts",
                          ["event_type = 'A'", "event_type = 'B'"]).collect()}
    assert got == {1: 2, 2: 0}


def test_sequence_count_sql(engine, spark):
    ev = _events(spark, [(1, 0, "A"), (1, 10, "B"), (1, 20, "A"), (1, 30, "B")])
    ev.createOrReplaceTempView("seqc_ev")
    out = engine.sql(
        "SELECT user_id, sequenceCount('(?1).*(?2)')(ts, event_type = 'A', "
        "event_type = 'B') AS n FROM seqc_ev GROUP BY user_id"
    )
    assert out.collect()[0]["n"] == 2


def test_histogram(spark):
    from otus_clickhouse_spark.operators.behavioral import histogram

    df = spark.createDataFrame([(float(x),) for x in range(100)], "v double")
    h = {r["bin"]: (r["lo"], r["hi"], r["height"]) for r in
         histogram(df, "v", 4).collect()}
    assert len(h) == 4
    assert h[0] == (0.0, 24.75, 25)
    assert h[3][2] == 25          # max value lands in the last bin
    assert sum(v[2] for v in h.values()) == 100


def test_uniq_up_to_sql(engine, spark):
    df = spark.createDataFrame([(i % 7,) for i in range(50)], "v int")
    df.createOrReplaceTempView("uut_t")
    assert engine.sql("SELECT uniqUpTo(10)(v) AS u FROM uut_t").collect()[0]["u"] == 7
    assert engine.sql("SELECT uniqUpTo(3)(v) AS u FROM uut_t").collect()[0]["u"] == 4


def test_topk_weighted_sql(engine, spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 10), ("c", 3)], "v string, w int"
    )
    df.createOrReplaceTempView("tkw_t")
    out = engine.sql("SELECT topKWeighted(2)(v, w) AS top FROM tkw_t")
    assert list(out.collect()[0]["top"]) == ["b", "c"]


def test_array_combinators_sql(engine, spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0]), (2, [10.0])], "g int, a array<double>"
    )
    df.createOrReplaceTempView("arrc_t")
    out = engine.sql(
        "SELECT g, sumArray(a) AS s, avgArray(a) AS m, minArray(a) AS lo, "
        "maxArray(a) AS hi, countArray(a) AS n FROM arrc_t GROUP BY g ORDER BY g"
    ).collect()
    assert (out[0]["s"], out[0]["m"], out[0]["lo"], out[0]["hi"], out[0]["n"]) == \
        (6.0, 2.0, 1.0, 3.0, 3)
    assert (out[1]["s"], out[1]["n"]) == (10.0, 1)


def test_quantile_variant_names_sql(engine, spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    df.createOrReplaceTempView("qv_t")
    out = engine.sql(
        "SELECT quantileTDigest(0.5)(v) AS a, quantileExactLow(0.5)(v) AS b "
        "FROM qv_t"
    ).collect()[0]
    assert 49.0 <= out["a"] <= 51.0
    assert 50.0 <= out["b"] <= 51.0


def test_window_funnel_mode_rejected(engine, spark):
    ev = _events(spark, [(1, 0, "A")])
    ev.createOrReplaceTempView("mode_ev")
    import pytest as _pytest
    with _pytest.raises(Exception, match="not supported"):
        engine.sql(
            "SELECT windowFunnel(3600, 'strict_order')(ts, event_type = 'A') "
            "FROM mode_ev GROUP BY user_id"
        )


def test_window_funnel_randomized_vs_bruteforce(spark):
    """200 random event streams, one Spark job, each compared against an
    exhaustive exists-chain search (the definitional semantics)."""
    import itertools
    import random

    rng = random.Random(20260814)
    TYPES = ["A", "B", "C", "D"]
    WINDOW = 50
    cases = {}
    rows = []
    for case in range(200):
        n = rng.randint(0, 8)
        ts = rng.sample(range(200), n)  # unique per case
        evs = sorted((t_, rng.choice(TYPES)) for t_ in ts)
        cases[case] = evs
        rows += [(case, t_, e) for t_, e in evs]

    def brute(evs):
        best = 0
        conds = ["A", "B", "C"]
        for L in (1, 2, 3):
            for combo in itertools.combinations(evs, L):
                if all(c[1] == conds[j] for j, c in enumerate(combo)) and \
                   combo[-1][0] - combo[0][0] <= WINDOW:
                    best = max(best, L)
        return best

    df = _events(spark, rows)
    got = _levels(window_funnel(df, "user_id", "ts", CONDS, WINDOW))
    for case, evs in cases.items():
        expected = brute(evs)
        assert got.get(case, 0) == expected, (case, evs, got.get(case), expected)


def test_sum_map_sql(engine, spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (1, "b", 2.0), (1, "a", 3.0)], "g int, k string, v double"
    )
    df.createOrReplaceTempView("smap_t")
    row = engine.sql("SELECT g, sumMap(k, v) AS m FROM smap_t GROUP BY g").collect()[0]
    assert list(row["m"]["keys"]) == ["a", "b"]
    assert list(row["m"]["values"]) == [4.5, 2.0]


def test_entropy_sql(engine, spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), ("b",)], "v string")
    df.createOrReplaceTempView("ent_t")
    row = engine.sql("SELECT entropy(v) AS e FROM ent_t").collect()[0]
    assert row["e"] == pytest.approx(1.0)


def test_avg_weighted_sql(engine, spark):
    df = spark.createDataFrame([(10.0, 1.0), (20.0, 3.0)], "x double, w double")
    df.createOrReplaceTempView("aw_t")
    row = engine.sql("SELECT avgWeighted(x, w) AS a FROM aw_t").collect()[0]
    assert row["a"] == pytest.approx(17.5)


def test_sequence_count_randomized_vs_scan(spark):
    """150 random streams vs a direct Python left-to-right scan with
    restart-after-match (the ClickHouse sequenceCount semantics)."""
    import random

    rng = random.Random(99)
    from otus_clickhouse_spark.operators.behavioral import sequence_count

    cases, rows = {}, []
    for case in range(150):
        n = rng.randint(0, 10)
        ts = rng.sample(range(300), n)
        evs = sorted((t_, rng.choice("ABC")) for t_ in ts)
        cases[case] = evs
        rows += [(case, t_, e) for t_, e in evs]

    def scan(evs):
        m, level = 0, 0
        for _, e in evs:
            if e == "AB"[level]:
                level += 1
                if level == 2:
                    m, level = m + 1, 0
        return m

    got = {r["user_id"]: r["n_matches"] for r in
           sequence_count(_events(spark, rows), "user_id", "ts",
                          ["event_type = 'A'", "event_type = 'B'"]).collect()}
    for case, evs in cases.items():
        assert got.get(case, 0) == scan(evs), (case, evs)


def test_sumcount_and_simple_linear_regression(engine):
    """sumCount → (sum, count) tuple; simpleLinearRegression(x, y) →
    (k, b) least-squares line (CH arg order x,y vs Spark regr_*'s y,x)."""
    r = engine.sql("SELECT sumCount(number) AS v FROM numbers(5)").collect()[0].v
    assert (r.sum, r["count"]) == (10, 5)
    lr = engine.sql(
        "SELECT simpleLinearRegression(number, number * 2 + 1) AS v FROM numbers(10)"
    ).collect()[0].v
    assert abs(lr.k - 2.0) < 1e-9 and abs(lr.b - 1.0) < 1e-9


def test_quantile_weighted_and_deterministic_variants(engine):
    """Weighted/deterministic quantile variants: *Weighted(p)(x, w) →
    Spark's exact weighted percentile (frequency arg);
    quantileDeterministic's determinator arg drops (exact computation
    is already deterministic); medianExact single-paren alias."""
    r = engine.sql(
        "SELECT quantileTDigestWeighted(0.5)(number, 1) AS w1,"
        "       quantileExactWeighted(0.5)(number, 1 + number % 2) AS w2,"
        "       quantileDeterministic(0.5)(number, number) AS det,"
        "       medianExact(number) AS med"
        " FROM numbers(100)"
    ).collect()[0]
    assert r.w1 == 49.5 and r.det == 49.5 and r.med == 49.5
    assert 49 <= r.w2 <= 51  # odd numbers weighted double shift the median up
