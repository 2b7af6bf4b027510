"""Generative dialect hardening (r10 verdict ask #5).

The reference-parity sweep runs ~120 LITERAL statements from the
reference's lectures/homework; this file composes RANDOM expressions
from the supported ClickHouse function inventory — nested HOFs, 1-based
subscripts, -If combinators, parametric aggregates, -State/-Merge
roundtrips — and checks translate→parse→execute against DuckDB on the
same rows (the same oracle discipline as tools/check_oracles.py, driven
by a seeded typed-expression grammar instead of a hand-written list).

Each generated node carries BOTH renderings (CH dialect for the engine,
ANSI for DuckDB), so the comparison is value-level, not just
did-it-parse. Semantics minefields are avoided BY CONSTRUCTION, not by
tolerance: intDiv/modulo only see non-negative operands (CH truncates
toward zero, DuckDB // floors), subscripts stay in range of the
fixed-length-3 array column, float comparisons get 1e-6 tolerance.

Found (and fixed) by this harness in r11:
- INSERT … VALUES with a `[…]` array literal parse-errored (the VALUES
  clause skipped the literal rewrite SELECT gets) — engine.py
  _values_frame;
- `arr[i + 1]` with a UInt64 expression failed analysis (element_at
  needs INT; computed subscripts now CAST) — dialect _rewrite_subscripts;
- CH's polymorphic length() failed on arrays — engine-level
  minimal-flip length(→size( analysis retry.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

N_EXPRS = 1200          # scalar expressions checked value-for-value
N_AGGS = 240            # aggregate expressions (incl. combinators)
BATCH = 12              # expressions per SELECT (amortize Spark jobs)
SEED = 1107


# --------------------------------------------------------------- fixture

ROWS = []
_r = random.Random(997)
_WORDS = ["Hello", "world", "Spark x", "", "a b c", "Zq", "mix MIX"]
for _i in range(24):
    ROWS.append((
        _i,                                  # id
        _r.randint(0, 50),                   # u  (non-negative)
        _r.randint(-9, 9),                   # i
        _r.randint(1, 7),                    # j  (positive divisor)
        _r.choice(_WORDS),                   # s
        [_r.randint(-9, 9) for _ in range(3)],  # arr (fixed length 3)
        round(_r.uniform(-5, 5), 2),         # d
    ))


@pytest.fixture(scope="module")
def fuzz_env(spark, tmp_path_factory):
    from otus_clickhouse_spark.engine import Engine

    base = tmp_path_factory.mktemp("fuzz")
    (base / "data").mkdir()
    eng = Engine(spark, data_dir=str(base / "data"))
    eng.execute(
        "CREATE TABLE fuzz_t (id UInt64, u UInt64, i Int64, j Int64, "
        "s String, arr Array(Int64), d Float64) ENGINE = Log"
    )
    eng.tables["fuzz_t"].path = str(base / "fuzz_t")
    values = ", ".join(
        f"({r[0]}, {r[1]}, {r[2]}, {r[3]}, '{r[4]}', [{','.join(map(str, r[5]))}], {r[6]})"
        for r in ROWS
    )
    eng.execute(f"INSERT INTO fuzz_t VALUES {values}")

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE fuzz_t (id BIGINT, u BIGINT, i BIGINT, j BIGINT, "
        "s VARCHAR, arr BIGINT[], d DOUBLE)"
    )
    duck_values = ", ".join(
        f"({r[0]}, {r[1]}, {r[2]}, {r[3]}, '{r[4]}', [{','.join(map(str, r[5]))}], {r[6]})"
        for r in ROWS
    )
    con.sql(f"INSERT INTO fuzz_t VALUES {duck_values}")
    return eng, con


# --------------------------------------------------- typed expression AST

class E:
    """A generated expression: paired CH / DuckDB renderings + type."""

    __slots__ = ("ch", "dk", "t")

    def __init__(self, ch: str, dk: str | None = None, t: str = "INT"):
        self.ch, self.dk, self.t = ch, (ch if dk is None else dk), t


def gen_int(rng: random.Random, depth: int) -> E:
    if depth <= 0:
        return rng.choice([
            E(str(rng.randint(-9, 9))),
            E("i"), E("u"), E("j"), E("id"),
        ])
    pick = rng.randrange(12)
    if pick == 0:   # intDiv: non-negative dividend, positive divisor
        d = rng.randint(1, 7)
        return E(f"intDiv(u, {d})", f"(u // {d})")
    if pick == 1:
        d = rng.randint(1, 7)
        return E(f"modulo(u, {d})", f"(u % {d})")
    if pick == 2:
        a, b = gen_int(rng, depth - 1), gen_int(rng, depth - 1)
        op = rng.choice(["+", "-", "*"])
        return E(f"({a.ch} {op} {b.ch})", f"({a.dk} {op} {b.dk})")
    if pick == 3:
        a = gen_int(rng, depth - 1)
        return E(f"abs({a.ch})", f"abs({a.dk})")
    if pick == 4:
        a, b = gen_int(rng, depth - 1), gen_int(rng, depth - 1)
        f = rng.choice(["least", "greatest"])
        return E(f"{f}({a.ch}, {b.ch})", f"{f}({a.dk}, {b.dk})")
    if pick == 5:
        s = gen_str(rng, depth - 1)
        return E(f"length({s.ch})", f"length({s.dk})")
    if pick == 6:   # 1-based subscript, in range of length-3 arrays
        a = gen_arr(rng, depth - 1, fixed_len=True)
        k = rng.randint(1, 3)
        return E(f"({a.ch})[{k}]", f"({a.dk})[{k}]")
    if pick == 7:
        a = gen_arr(rng, depth - 1)
        return E(f"length({a.ch})", f"len({a.dk})")
    if pick == 8:
        a = gen_arr(rng, depth - 1)
        return E(f"arraySum({a.ch})",
                 f"coalesce(list_aggregate({a.dk}, 'sum'), 0)")
    if pick == 9:
        b = gen_bool(rng, depth - 1)
        x, y = gen_int(rng, depth - 1), gen_int(rng, depth - 1)
        return E(f"if({b.ch}, {x.ch}, {y.ch})",
                 f"(CASE WHEN {b.dk} THEN {x.dk} ELSE {y.dk} END)")
    if pick == 10:
        b1, b2 = gen_bool(rng, depth - 1), gen_bool(rng, depth - 1)
        x, y, z = (gen_int(rng, depth - 1) for _ in range(3))
        return E(
            f"multiIf({b1.ch}, {x.ch}, {b2.ch}, {y.ch}, {z.ch})",
            f"(CASE WHEN {b1.dk} THEN {x.dk} WHEN {b2.dk} THEN {y.dk} "
            f"ELSE {z.dk} END)",
        )
    s = gen_str(rng, depth - 1)
    lit = rng.choice(["l", "o", "x", " "])
    return E(f"position({s.ch}, '{lit}')", f"strpos({s.dk}, '{lit}')")


def gen_str(rng: random.Random, depth: int) -> E:
    if depth <= 0:
        return rng.choice([E("s", t="STR"), E("'abc'", t="STR"), E("'Zz y'", t="STR")])
    pick = rng.randrange(6)
    if pick == 0:
        a, b = gen_str(rng, depth - 1), gen_str(rng, depth - 1)
        return E(f"concat({a.ch}, {b.ch})", f"concat({a.dk}, {b.dk})", "STR")
    if pick == 1:
        a = gen_str(rng, depth - 1)
        f = rng.choice(["upper", "lower"])
        return E(f"{f}({a.ch})", f"{f}({a.dk})", "STR")
    if pick == 2:
        a = gen_str(rng, depth - 1)
        start, n = rng.randint(1, 3), rng.randint(1, 4)
        return E(f"substring({a.ch}, {start}, {n})",
                 f"substring({a.dk}, {start}, {n})", "STR")
    if pick == 3:
        a = gen_str(rng, depth - 1)
        return E(f"reverse({a.ch})", f"reverse({a.dk})", "STR")
    if pick == 4:
        a = gen_str(rng, depth - 1)
        n = rng.randint(1, 3)
        return E(f"repeat({a.ch}, {n})", f"repeat({a.dk}, {n})", "STR")
    b = gen_bool(rng, depth - 1)
    x, y = gen_str(rng, depth - 1), gen_str(rng, depth - 1)
    return E(f"if({b.ch}, {x.ch}, {y.ch})",
             f"(CASE WHEN {b.dk} THEN {x.dk} ELSE {y.dk} END)", "STR")


def gen_bool(rng: random.Random, depth: int) -> E:
    pick = rng.randrange(5)
    if pick == 0:
        a, b = gen_int(rng, max(depth - 1, 0)), gen_int(rng, max(depth - 1, 0))
        op = rng.choice(["=", "<", ">", "<=", ">=", "!="])
        return E(f"({a.ch} {op} {b.ch})", f"({a.dk} {op} {b.dk})", "BOOL")
    if pick == 1:
        a = gen_str(rng, max(depth - 1, 0))
        f = rng.choice(["startsWith", "endsWith"])
        dk = "starts_with" if f == "startsWith" else "ends_with"
        lit = rng.choice(["H", "x", "a"])
        return E(f"{f}({a.ch}, '{lit}')", f"{dk}({a.dk}, '{lit}')", "BOOL")
    if pick == 2:
        a = gen_arr(rng, max(depth - 1, 0))
        k = rng.randint(-9, 9)
        return E(f"has({a.ch}, {k})", f"list_contains({a.dk}, {k})", "BOOL")
    if pick == 3:
        a = gen_str(rng, max(depth - 1, 0))
        f = rng.choice(["empty", "notEmpty"])
        dk = f"(length({a.dk}) = 0)" if f == "empty" else f"(length({a.dk}) > 0)"
        return E(f"{f}({a.ch})", dk, "BOOL")
    a, b = gen_bool(rng, max(depth - 1, 0)), gen_bool(rng, max(depth - 1, 0))
    op = rng.choice(["AND", "OR"])
    return E(f"({a.ch} {op} {b.ch})", f"({a.dk} {op} {b.dk})", "BOOL")


def gen_arr(rng: random.Random, depth: int, fixed_len: bool = False) -> E:
    """fixed_len=True restricts to length-preserving forms so a
    1-based subscript [1..3] stays in range."""
    if depth <= 0:
        return E("arr", t="ARR")
    pick = rng.randrange(5 if not fixed_len else 3)
    if pick == 0:
        a = gen_arr(rng, depth - 1, fixed_len)
        k = rng.randint(-3, 3)
        return E(f"arrayMap(x -> x + {k}, {a.ch})",
                 f"list_transform({a.dk}, x -> x + {k})", "ARR")
    if pick == 1:
        a = gen_arr(rng, depth - 1, fixed_len)
        return E(f"arraySort({a.ch})", f"list_sort({a.dk})", "ARR")
    if pick == 2:
        a = gen_arr(rng, depth - 1, fixed_len)
        return E(f"arrayReverse({a.ch})", f"list_reverse({a.dk})", "ARR")
    if pick == 3:
        a = gen_arr(rng, depth - 1)
        k = rng.randint(-9, 9)
        return E(f"arrayFilter(x -> x > {k}, {a.ch})",
                 f"list_filter({a.dk}, x -> x > {k})", "ARR")
    a, b = gen_arr(rng, depth - 1), gen_arr(rng, depth - 1)
    return E(f"arrayConcat({a.ch}, {b.ch})",
             f"list_concat({a.dk}, {b.dk})", "ARR")


def gen_scalar(rng: random.Random) -> E:
    kind = rng.randrange(10)
    depth = rng.randint(1, 3)
    if kind < 5:
        return gen_int(rng, depth)
    if kind < 8:
        return gen_str(rng, depth)
    if kind < 9:
        e = gen_bool(rng, depth)
        # normalize: CH booleans are UInt8 0/1, DuckDB booleans — cast both
        return E(f"if({e.ch}, 1, 0)",
                 f"(CASE WHEN {e.dk} THEN 1 ELSE 0 END)", "INT")
    return gen_arr(rng, depth)


def gen_agg(rng: random.Random) -> E:
    pick = rng.randrange(10)
    if pick == 0:
        b = gen_bool(rng, 1)
        return E(f"sumIf(u, {b.ch})",
                 f"coalesce(sum(u) FILTER (WHERE {b.dk}), 0)")
    if pick == 1:
        b = gen_bool(rng, 1)
        return E(f"countIf({b.ch})", f"count(*) FILTER (WHERE {b.dk})")
    if pick == 2:
        b = gen_bool(rng, 1)
        return E(f"ifNull(avgIf(d, {b.ch}), 0.0)",
                 f"coalesce(avg(d) FILTER (WHERE {b.dk}), 0.0)", "DBL")
    if pick == 3:
        c = rng.choice(["u", "i", "j", "s"])
        return E(f"uniqExact({c})", f"count(DISTINCT {c})")
    if pick == 4:
        c = rng.choice(["u", "i", "j"])
        return E(f"sumDistinct({c})", f"sum(DISTINCT {c})")
    if pick == 5:   # argMax/argMin over the UNIQUE id key — deterministic
        c = rng.choice(["u", "i", "s"])
        f = rng.choice(["argMax", "argMin"])
        dk = "arg_max" if f == "argMax" else "arg_min"
        return E(f"{f}({c}, id)", f"{dk}({c}, id)",
                 "STR" if c == "s" else "INT")
    if pick == 6:
        # quantileExact → Spark percentile (exact, linear-interpolated)
        # ≡ DuckDB quantile_cont; plain quantile maps to
        # percentile_approx, whose sketch has no DuckDB equivalent
        q = rng.choice(["0.25", "0.5", "0.9"])
        return E(f"quantileExact({q})(u)", f"quantile_cont(u, {q})", "DBL")
    if pick == 7:
        c = rng.choice(["u", "i"])
        return E(f"arraySort(groupArray({c}))",
                 f"list_sort(list({c}))", "ARR")
    if pick == 8:
        c = rng.choice(["u", "i", "j"])
        f = rng.choice(["min", "max", "sum"])
        return E(f"{f}({c})", f"{f}({c})")
    e = gen_int(rng, 1)
    return E(f"sum({e.ch})", f"sum({e.dk})")


# ------------------------------------------------------------ comparison

def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "as_integer_ratio") and not isinstance(v, int):  # Decimal
        f = float(v)
        return int(f) if f.is_integer() else round(f, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _close(a, b):
    a, b = _norm(a), _norm(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
    return a == b


def _run_batch(fuzz_env, exprs, group_by: str | None = None, agg: bool = False):
    eng, con = fuzz_env
    sel_ch = ", ".join(f"{e.ch} AS c{i}" for i, e in enumerate(exprs))
    sel_dk = ", ".join(f"{e.dk} AS c{i}" for i, e in enumerate(exprs))
    if group_by:
        ch_sql = (f"SELECT {group_by} AS g, {sel_ch} FROM fuzz_t "
                  f"GROUP BY {group_by} ORDER BY g")
        dk_sql = (f"SELECT {group_by} AS g, {sel_dk} FROM fuzz_t "
                  f"GROUP BY {group_by} ORDER BY g")
    elif agg:  # global aggregate: one row, no grouping column
        ch_sql = f"SELECT 0 AS g, {sel_ch} FROM fuzz_t"
        dk_sql = f"SELECT 0 AS g, {sel_dk} FROM fuzz_t"
    else:
        ch_sql = f"SELECT id, {sel_ch} FROM fuzz_t ORDER BY id"
        dk_sql = f"SELECT id, {sel_dk} FROM fuzz_t ORDER BY id"
    got = eng.run(ch_sql)
    want = con.sql(dk_sql).fetchall()
    assert len(got) == len(want), (ch_sql, len(got), len(want))
    bad = []
    for grow, wrow in zip(got, want):
        for idx in range(1, len(wrow)):
            if not _close(grow[idx], wrow[idx]):
                bad.append((exprs[idx - 1].ch, grow[0], grow[idx], wrow[idx]))
    assert not bad, f"{len(bad)} mismatches, first 5: {bad[:5]}\nCH: {ch_sql}"


# ----------------------------------------------------------------- tests

def test_fuzz_scalar_expressions(fuzz_env):
    """≥1000 generated scalar expressions, value-checked vs DuckDB."""
    rng = random.Random(SEED)
    exprs = [gen_scalar(rng) for _ in range(N_EXPRS)]
    for i in range(0, len(exprs), BATCH):
        _run_batch(fuzz_env, exprs[i : i + BATCH])


def test_fuzz_aggregates_and_combinators(fuzz_env):
    """Generated aggregates (-If, Distinct, parametric quantile,
    argMax/argMin, groupArray) under GROUP BY, value-checked vs DuckDB."""
    rng = random.Random(SEED + 1)
    aggs = [gen_agg(rng) for _ in range(N_AGGS)]
    for i in range(0, len(aggs), BATCH):
        group = rng.choice([None, "(u % 3)", "(j % 2)"])
        _run_batch(fuzz_env, aggs[i : i + BATCH], group_by=group, agg=True)


def test_fuzz_state_merge_roundtrip(fuzz_env):
    """-State → finalizeAggregation must equal the plain aggregate for
    every mergeable function the dialect exposes (engine-only property —
    no DuckDB analogue for CH aggregate states)."""
    eng, _ = fuzz_env
    for f in ["sum", "min", "max", "count", "avg"]:
        a = eng.run(f"SELECT finalizeAggregation({f}State(u)) AS e FROM fuzz_t")
        b = eng.run(f"SELECT {f}(u) AS e FROM fuzz_t")
        # avg: the state path keeps DOUBLE, the plain path returns
        # DECIMAL(…, 4) for a UInt64 column — same value at 4dp
        assert math.isclose(float(a[0][0]), float(b[0][0]), abs_tol=1e-4), (f, a, b)
