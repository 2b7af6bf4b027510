"""ClickHouse-SQL → Spark-SQL dialect translation (SURVEY.md §7 Phase 1).

Handles the constructs that cannot be SQL UDFs:

- ``FROM <table> FINAL``  → the engine-semantics ``<table>__final`` view
  (lectures/lecture_07.md:465-481: FINAL collapses Replacing/Summing/
  Collapsing engine duplicates at read time).
- ``count()``             → ``count(*)`` (ClickHouse's zero-arg count).
- aggregate-name aliases  (``uniq`` → ``approx_count_distinct``,
  ``argMax`` → ``max_by``, ``groupArray`` → ``collect_list``, …).
- ``multiIf(c1,v1,…,else)`` → ``CASE WHEN`` chain (lecture_06.md:12).
- ``-If`` combinators     → ``agg(x) FILTER (WHERE cond)``
  (lecture_06.md:67, lecture_07.md:509).

Everything else (CTEs, window functions, ROLLUP, INTERSECT/EXCEPT,
lambdas) is already valid Spark SQL.
"""

from __future__ import annotations

import re

from otus_clickhouse_spark.functions.clickhouse import AGGREGATE_ALIASES, SCALAR_ALIASES

_FINAL_RE = re.compile(r"\bFROM\s+([A-Za-z_][A-Za-z0-9_.]*)\s+FINAL\b", re.IGNORECASE)
_COUNT0_RE = re.compile(r"\bcount\s*\(\s*\)", re.IGNORECASE)
# {id:UInt8} query parameters (lectures/lecture_03.md:303-307) → Spark :id
_PARAM_RE = re.compile(r"\{\s*([A-Za-z_][\w]*)\s*:\s*[A-Za-z_][\w()]*\s*\}")

_SIMPLE_ALIASES = {
    **{k: v for k, v in AGGREGATE_ALIASES.items() if not k.endswith("If")},
    **SCALAR_ALIASES,
}
_ALIAS_RE = re.compile(
    r"\b(" + "|".join(sorted(_SIMPLE_ALIASES, key=len, reverse=True)) + r")\s*\("
)
_IF_COMBINATOR_RE = re.compile(r"\b(sum|count|avg|min|max|argMax|argMin|uniq)If\s*\(")


def _split_call_args(s: str, open_paren: int) -> tuple[list[str], int]:
    """Robust top-level arg splitter (handles nesting + quotes)."""
    depth = 0
    args: list[str] = []
    buf: list[str] = []
    i = open_paren + 1
    while i < len(s):
        c = s[i]
        if c in "'\"":
            j = i + 1
            while j < len(s) and s[j] != c:
                j += 1
            buf.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                args.append("".join(buf).strip())
                return args, i + 1
            depth -= 1
        elif c == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    raise ValueError("unbalanced parens")


def _rewrite_multiif(text: str) -> str:
    while True:
        m = re.search(r"\bmultiIf\s*\(", text)
        if not m:
            return text
        args, end = _split_call_args(text, text.index("(", m.start()))
        pairs = args[:-1]
        default = args[-1]
        whens = " ".join(
            f"WHEN {pairs[i]} THEN {pairs[i + 1]}" for i in range(0, len(pairs) - 1, 2)
        )
        text = text[: m.start()] + f"(CASE {whens} ELSE {default} END)" + text[end:]


def _rewrite_if_combinators(text: str) -> str:
    """aggIf(x, cond) → agg(x) FILTER (WHERE cond); countIf(cond) → count_if."""
    while True:
        m = _IF_COMBINATOR_RE.search(text)
        if not m:
            return text
        base = m.group(1)
        args, end = _split_call_args(text, text.index("(", m.start()))
        spark_agg = {"argMax": "max_by", "argMin": "min_by", "uniq": "approx_count_distinct"}.get(base, base)
        if base == "count" and len(args) == 1:
            repl = f"count_if({args[0]})"
        else:
            cond = args[-1]
            inner = ", ".join(args[:-1])
            repl = f"{spark_agg}({inner}) FILTER (WHERE {cond})"
        text = text[: m.start()] + repl + text[end:]


def _rewrite_splitByChar(text: str) -> str:
    """Inline splitByChar(sep, s) → split(s, quoted-sep) textually.

    The SQL-UDF form exists too, but Spark rejects SQL UDFs inside
    Generate, so compositions like ``arrayJoin(splitByChar(...))``
    need the inlined builtin.
    """
    while True:
        m = re.search(r"\bsplitByChar\s*\(", text)
        if not m:
            return text
        args, end = _split_call_args(text, text.index("(", m.start()))
        sep, s = args
        repl = f"split({s}, concat('\\\\Q', {sep}, '\\\\E'))"
        text = text[: m.start()] + repl + text[end:]


def _rewrite_dictget(text: str, dicts: dict[str, str]) -> str:
    """SQL-level dictGet family (lectures/lecture_11.md:20-40,305-345).

    ``dictGet('d', 'attr', k)`` → a correlated scalar subquery over the
    registered ``dict_d`` view. Catalyst rewrites the subquery into a
    (broadcast-able) left outer join, so the lookup stays JVM-side —
    same physical shape as :meth:`Dictionary.get`.
    """
    while True:
        m = re.search(r"\bdict(Get|GetOrDefault|GetOrNull|Has)\s*\(", text)
        if not m:
            return text
        kind = m.group(1)
        args, end = _split_call_args(text, text.index("(", m.start()))
        dname = args[0].strip().strip("'\"")
        key = dicts.get(dname)
        if key is None:
            raise KeyError(f"unknown dictionary: {dname}")
        if kind == "Has":
            repl = f"((SELECT count(*) FROM dict_{dname} WHERE {key} = ({args[1]})) > 0)"
        else:
            attr = args[1].strip().strip("'\"")
            sub = f"(SELECT max({attr}) FROM dict_{dname} WHERE {key} = ({args[2]}))"
            if kind == "GetOrDefault":
                repl = f"coalesce({sub}, {args[3]})"
            else:
                repl = sub
        text = text[: m.start()] + repl + text[end:]


def translate(text: str, tables: dict | None = None, dicts: dict | None = None) -> str:
    """Translate ClickHouse-dialect SQL into Spark SQL.

    ``dicts`` maps dictionary name → key column for dictGet rewrites.
    """
    tables = tables or {}

    def final_sub(m: re.Match) -> str:
        return f"FROM {m.group(1)}__final"

    text = _FINAL_RE.sub(final_sub, text)
    text = _PARAM_RE.sub(lambda m: f":{m.group(1)}", text)
    text = _COUNT0_RE.sub("count(*)", text)
    text = re.sub(r"\buniqExact\s*\(", "count(DISTINCT ", text)
    text = _rewrite_multiif(text)
    text = _rewrite_if_combinators(text)
    text = _rewrite_splitByChar(text)
    if dicts:
        text = _rewrite_dictget(text, dicts)
    text = _ALIAS_RE.sub(lambda m: _SIMPLE_ALIASES[m.group(1)] + "(", text)
    return text
