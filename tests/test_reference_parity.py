"""Dialect parity sweep: every literal SELECT in the reference course's
markdown must translate into SQL that Spark's parser accepts.

This is breadth evidence for SURVEY.md §2.8/§2.2 — the translator is
exercised against the course's own query corpus, not just hand-picked
cases. Statements needing session objects (dictionaries, Set/Join
engine tables) are excluded: they translate only once those objects are
registered, which dedicated tests cover.
"""

import glob
import os
import re

import pytest

REFERENCE = "/root/reference"

# non-SQL artifacts inside ```sql blocks: jinja templates, typographic
# quotes, literal ellipses, console output glued to the query
_GARBAGE = re.compile(r"\{\{|\{%|[’‘]|\.\.\.|Query id:")
# need registered session objects (covered by test_statements.py)
_NEEDS_OBJECTS = re.compile(r"\b(dictGet|joinGet)\s*\(|\bIN\s+[A-Z]{2}\b")


def _statements():
    out = []
    for f in glob.glob(f"{REFERENCE}/homeworks/*.md") + glob.glob(f"{REFERENCE}/lectures/*.md"):
        text = open(f).read()
        for m in re.finditer(r"```sql\n(.*?)```", text, re.DOTALL):
            for stmt in m.group(1).split(";"):
                s = stmt.strip()
                if s.upper().startswith(("SELECT", "WITH")) and len(s) > 20:
                    out.append((os.path.basename(f), s))
    return out


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference snapshot not present")
def test_reference_selects_translate_and_parse(spark):
    from otus_clickhouse_spark.functions.dialect import translate

    parser = spark._jsparkSession.sessionState().sqlParser()
    total, failed = 0, []
    for fname, s in _statements():
        if _GARBAGE.search(s) or _NEEDS_OBJECTS.search(s):
            continue
        total += 1
        try:
            t = translate(s)
            # clauses Engine.sql routes outside the translator
            t = re.sub(r"\bLIMIT\s+\d+\s+BY\s+.*$", "", t, flags=re.I | re.S)
            t = re.sub(r"WITH\s+FILL.*$", "", t, flags=re.I | re.S)
            parser.parsePlan(t)
        except Exception as e:  # noqa: BLE001 — collecting a report
            failed.append((fname, s[:80], str(e).split("\n")[0][:80]))
    assert total > 100, f"sweep found too few statements ({total})"
    assert not failed, f"{len(failed)}/{total} reference SELECTs failed: {failed[:5]}"
