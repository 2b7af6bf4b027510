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

# the ~1600-statement generative sweep is the full suite's second
# biggest wall (r13); excluded from the driver's default verify
# window, run at round close with -m ""
pytestmark = pytest.mark.slow

N_EXPRS = 1200          # scalar expressions checked value-for-value
N_AGGS = 240            # aggregate expressions (incl. combinators)
N_WINDOWS = 200         # window functions with frames (r11 ask #5)
N_ARRAY_JOINS = 110     # ARRAY JOIN incl. LEFT + multi-array
N_FILLS = 60            # ORDER BY … WITH FILL grids
N_JOINS = 130           # 2-table joins USING/ON + IN-subqueries
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

    # second relation for the join family (r11 ask #5): UNIQUE k so
    # ANY JOIN is deterministic; v overlaps fuzz_t.u partially and is
    # never NULL (NOT IN stays well-defined)
    eng.execute(
        "CREATE TABLE fuzz_u (k UInt64, v Int64, w String) ENGINE = Log"
    )
    eng.tables["fuzz_u"].path = str(base / "fuzz_u")
    con.sql("CREATE TABLE fuzz_u (k BIGINT, v BIGINT, w VARCHAR)")
    u_vals = ", ".join(
        f"({k}, {(k * 7) % 40}, '{'uvw'[k % 3]}{k % 5}')" for k in range(0, 30, 2)
    )
    eng.execute(f"INSERT INTO fuzz_u VALUES {u_vals}")
    con.sql(f"INSERT INTO fuzz_u VALUES {u_vals}")
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


# ------------------------------------------------- r12 grammar families
# (r11 verdict ask #5: the structurally hardest rewrites — window
# functions with frames, ARRAY JOIN incl. LEFT/multi-array, WITH FILL,
# 2-table joins USING/ON + IN-subqueries, and -State/-Merge roundtrips
# through persisted tables.)


def _run_sql_pair(fuzz_env, ch_sql: str, dk_sql: str):
    """Run a full CH statement on the engine and its ANSI twin on
    DuckDB; compare complete ordered result sets value-for-value."""
    eng, con = fuzz_env
    got = eng.run(ch_sql)
    want = con.sql(dk_sql).fetchall()
    assert len(got) == len(want), (ch_sql, dk_sql, len(got), len(want))
    for rn, (grow, wrow) in enumerate(zip(got, want)):
        assert len(grow) == len(wrow), (ch_sql, rn)
        for idx in range(len(wrow)):
            assert _close(grow[idx], wrow[idx]), (
                ch_sql, dk_sql, rn, idx, grow[idx], wrow[idx],
            )


_WIN_FRAMES = [
    "",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
]


def gen_window(rng: random.Random) -> E:
    part = rng.choice(["", "PARTITION BY (u % 3)", "PARTITION BY (j % 2)"])
    kind = rng.randrange(10)
    if kind < 3:  # pure ranking — no frame allowed
        f = rng.choice(["row_number()", "rank()", "dense_rank()", "ntile(3)"])
        over = f"OVER ({part} ORDER BY id)"
        return E(f"{f} {over}")
    if kind < 5:  # lag/lead with default
        f = rng.choice(["lag", "lead"])
        c = rng.choice(["u", "i", "s"])
        dflt = "''" if c == "s" else str(rng.randint(-5, 5))
        over = f"OVER ({part} ORDER BY id)"
        return E(f"{f}({c}, 1, {dflt}) {over}",
                 t="STR" if c == "s" else "INT")
    if kind < 6:  # CH -If combinator inside a window
        frame = rng.choice(_WIN_FRAMES)
        over = f"OVER ({part} ORDER BY id {frame})"
        b_ch, b_dk = "(i > 0)", "(i > 0)"
        return E(f"sumIf(u, {b_ch}) {over}",
                 f"sum(u) FILTER (WHERE {b_dk}) {over}")
    # framed aggregate
    f, c = rng.choice([
        ("sum", "u"), ("min", "i"), ("max", "u"), ("count", "j"), ("avg", "d"),
    ])
    frame = rng.choice(_WIN_FRAMES)
    over = f"OVER ({part} ORDER BY id {frame})"
    t = "DBL" if f == "avg" else "INT"
    return E(f"{f}({c}) {over}", t=t)


def test_fuzz_window_functions_with_frames(fuzz_env):
    rng = random.Random(SEED + 2)
    exprs = [gen_window(rng) for _ in range(N_WINDOWS)]
    for i in range(0, len(exprs), 8):
        batch = exprs[i : i + 8]
        sel_ch = ", ".join(f"{e.ch} AS c{k}" for k, e in enumerate(batch))
        sel_dk = ", ".join(f"{e.dk} AS c{k}" for k, e in enumerate(batch))
        _run_sql_pair(
            fuzz_env,
            f"SELECT id, {sel_ch} FROM fuzz_t ORDER BY id",
            f"SELECT id, {sel_dk} FROM fuzz_t ORDER BY id",
        )


def gen_array_join(rng: random.Random) -> tuple[str, str]:
    kind = rng.randrange(4)
    if kind == 0:  # plain single-array
        a = gen_arr(rng, rng.randint(0, 2))
        return (
            f"SELECT id, x FROM fuzz_t ARRAY JOIN {a.ch} AS x ORDER BY id, x",
            f"SELECT id, unnest({a.dk}) AS x FROM fuzz_t ORDER BY id, x",
        )
    if kind == 1:  # LEFT: empty arrays keep the row (engine: NULL element)
        k = rng.randint(5, 9)
        ch_e = f"arrayFilter(x -> x > {k}, arr)"
        dk_e = f"list_filter(arr, x -> x > {k})"
        return (
            f"SELECT id, x FROM fuzz_t LEFT ARRAY JOIN {ch_e} AS x "
            f"ORDER BY id, x",
            f"SELECT id, unnest(CASE WHEN len({dk_e}) = 0 "
            f"THEN [NULL]::BIGINT[] ELSE {dk_e} END) AS x FROM fuzz_t "
            f"ORDER BY id, x NULLS LAST",
        )
    if kind == 2:  # multi-array: ALIGNED unnest, not cartesian
        m = rng.randint(-3, 3)
        return (
            f"SELECT id, x, y FROM fuzz_t "
            f"ARRAY JOIN arr AS x, arrayMap(e -> e * 2 + {m}, arr) AS y "
            f"ORDER BY id, x, y",
            f"SELECT id, unnest(arr) AS x, "
            f"unnest(list_transform(arr, e -> e * 2 + {m})) AS y FROM fuzz_t "
            f"ORDER BY id, x, y",
        )
    # ARRAY JOIN + WHERE on the unnested alias
    k = rng.randint(-5, 5)
    return (
        f"SELECT id, x FROM fuzz_t ARRAY JOIN arr AS x WHERE x > {k} "
        f"ORDER BY id, x",
        f"SELECT id, x FROM (SELECT id, unnest(arr) AS x FROM fuzz_t) "
        f"WHERE x > {k} ORDER BY id, x",
    )


def test_fuzz_array_join(fuzz_env):
    rng = random.Random(SEED + 3)
    for _ in range(N_ARRAY_JOINS):
        ch_sql, dk_sql = gen_array_join(rng)
        _run_sql_pair(fuzz_env, ch_sql, dk_sql)


def gen_with_fill(rng: random.Random) -> tuple[str, str]:
    m = rng.randint(4, 8)
    lo = rng.randint(0, 2)
    hi = rng.randint(m + 1, m + 4)
    step = rng.choice([1, 1, 2])
    agg_ch, agg_dk = rng.choice([
        ("count() AS c", "count(*) AS c"),
        ("sum(j) AS c", "sum(j) AS c"),
        ("max(u) AS c", "max(u) AS c"),
    ])
    ch = (
        f"SELECT (u % {m}) AS g, {agg_ch} FROM fuzz_t GROUP BY g "
        f"ORDER BY g WITH FILL FROM {lo} TO {hi} STEP {step}"
    )
    # CH WITH FILL: TO is exclusive; rows already present keep their
    # values, grid rows fill other columns with NULL; source rows
    # OUTSIDE the grid still appear (fill only adds, never drops)
    dk = (
        f"WITH agg AS (SELECT (u % {m}) AS g, {agg_dk} FROM fuzz_t GROUP BY g), "
        f"grid AS (SELECT range AS g FROM range({lo}, {hi}, {step}) "
        f"         UNION SELECT g FROM agg) "
        f"SELECT grid.g AS g, agg.c AS c FROM grid LEFT JOIN agg USING (g) "
        f"ORDER BY g"
    )
    return ch, dk


def test_fuzz_with_fill(fuzz_env):
    rng = random.Random(SEED + 4)
    for _ in range(N_FILLS):
        ch_sql, dk_sql = gen_with_fill(rng)
        _run_sql_pair(fuzz_env, ch_sql, dk_sql)


def gen_join(rng: random.Random) -> tuple[str, str]:
    kind = rng.randrange(8)
    jt = rng.choice(["INNER", "LEFT", "RIGHT", "FULL"])
    if kind < 3:  # ON join with optional extra predicate
        extra = rng.choice(["", f" AND b.v > {rng.randint(0, 20)}"])
        sql = (
            f"SELECT a.id AS id, a.u AS u, b.v AS v, b.w AS w "
            f"FROM fuzz_t a {jt} JOIN fuzz_u b ON a.id = b.k{extra} "
            f"ORDER BY id NULLS LAST, v NULLS LAST, w NULLS LAST"
        )
        return sql, sql
    if kind == 3:  # USING through a renamed subquery
        sql = (
            f"SELECT k, u, v FROM (SELECT id AS k, u FROM fuzz_t) a "
            f"{jt} JOIN fuzz_u b USING (k) "
            f"ORDER BY k NULLS LAST, u NULLS LAST, v NULLS LAST"
        )
        return sql, sql
    if kind == 4:  # IN-subquery
        n = rng.randint(0, 20)
        neg = rng.choice(["", "NOT "])
        sql = (
            f"SELECT id, u FROM fuzz_t "
            f"WHERE u {neg}IN (SELECT v FROM fuzz_u WHERE v > {n}) "
            f"ORDER BY id"
        )
        return sql, sql
    if kind == 5:  # GLOBAL IN (CH spelling; plain IN on one box)
        n = rng.randint(0, 20)
        return (
            f"SELECT id, u FROM fuzz_t "
            f"WHERE u GLOBAL IN (SELECT v FROM fuzz_u WHERE v > {n}) "
            f"ORDER BY id",
            f"SELECT id, u FROM fuzz_t "
            f"WHERE u IN (SELECT v FROM fuzz_u WHERE v > {n}) "
            f"ORDER BY id",
        )
    if kind == 6:  # correlated EXISTS
        sql = (
            f"SELECT id FROM fuzz_t t WHERE EXISTS "
            f"(SELECT 1 FROM fuzz_u x WHERE x.k = t.id AND x.v >= {rng.randint(0, 15)}) "
            f"ORDER BY id"
        )
        return sql, sql
    # ANY LEFT JOIN — deterministic because fuzz_u.k is unique
    return (
        f"SELECT a.id AS id, b.v AS v FROM fuzz_t a "
        f"ANY LEFT JOIN fuzz_u b ON a.id = b.k ORDER BY id",
        f"SELECT a.id AS id, b.v AS v FROM fuzz_t a "
        f"LEFT JOIN fuzz_u b ON a.id = b.k ORDER BY id",
    )


def test_fuzz_two_table_joins(fuzz_env):
    rng = random.Random(SEED + 5)
    for _ in range(N_JOINS):
        ch_sql, dk_sql = gen_join(rng)
        _run_sql_pair(fuzz_env, ch_sql, dk_sql)


def test_fuzz_state_merge_through_persisted_table(fuzz_env):
    """-State aggregates written to a PERSISTED table (CTAS), read back
    and -Merge'd, must equal the direct aggregate — including partial
    states from disjoint slices merged across rows (the distributed
    two-phase shape; engine-only property, DuckDB has no CH states)."""
    eng, _ = fuzz_env
    cases = [
        ("sum", "u"), ("min", "i"), ("max", "u"), ("count", "u"),
        ("avg", "d"), ("uniqExact", "j"),
    ]
    for f, c in cases:
        eng.execute("DROP TABLE IF EXISTS fz_states")
        # two disjoint half-corpus states per group, persisted via CTAS
        eng.execute(
            f"CREATE TABLE fz_states ENGINE = Log AS "
            f"SELECT (u % 3) AS g, {f}State({c}) AS st FROM fuzz_t "
            f"WHERE id < 12 GROUP BY g"
        )
        eng.execute(
            f"INSERT INTO fz_states "
            f"SELECT (u % 3) AS g, {f}State({c}) AS st FROM fuzz_t "
            f"WHERE id >= 12 GROUP BY g"
        )
        got = eng.run(
            f"SELECT g, {f}Merge(st) AS e FROM fz_states GROUP BY g ORDER BY g"
        )
        want = eng.run(
            f"SELECT (u % 3) AS g, {f}({c}) AS e FROM fuzz_t GROUP BY g ORDER BY g"
        )
        assert len(got) == len(want), (f, got, want)
        for (gg, ge), (wg, we) in zip(got, want):
            assert gg == wg, (f, got, want)
            assert math.isclose(float(ge), float(we), abs_tol=1e-4), (f, got, want)
        eng.execute("DROP TABLE IF EXISTS fz_states")


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
