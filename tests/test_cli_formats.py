"""Output-FORMAT rendering + CLI statement loop (S12, EP1;
lectures/lecture_03.md:196-213 format surface, hw02.md:110 ``\\G``)."""

from otus_clickhouse_spark.__main__ import _split_statements, pop_format, run_statement
from otus_clickhouse_spark.formats import render

COLS = ["id", "name", "score"]
ROWS = [(1, "alice", 9.5), (2, "bo,b", None)]


def test_pretty_box():
    out = render(COLS, ROWS, "Pretty")
    lines = out.split("\n")
    assert lines[0].startswith("┌─id─┬─name─") and lines[-1].startswith("└")
    assert "│  1 │ alice │" in lines[1]  # numbers right-aligned, strings left


def test_vertical():
    out = render(COLS, ROWS, "Vertical")
    assert "Row 1:" in out and "name : alice" in out and "score: \\N" in out


def test_csv_tsv_json_values():
    assert render(COLS, ROWS, "CSVWithNames").splitlines()[0] == "id,name,score"
    assert '"bo,b"' in render(COLS, ROWS, "CSV")  # quoted comma
    assert render(COLS, ROWS, "TSV").splitlines()[0] == "1\talice\t9.5"
    json_lines = render(COLS, ROWS, "JSONEachRow").splitlines()
    assert json_lines[0] == '{"id": 1, "name": "alice", "score": 9.5}'
    assert render(COLS, ROWS, "Values").startswith("(1,'alice',9.5)")
    assert render(COLS, ROWS, "Null") == ""


def test_pop_format():
    assert pop_format("SELECT 1 FORMAT JSONEachRow") == ("SELECT 1", "JSONEachRow")
    assert pop_format("SELECT 1\\G") == ("SELECT 1", "Vertical")
    assert pop_format("SELECT 1;") == ("SELECT 1", None)


def test_split_statements():
    stmts = _split_statements(
        "SELECT 'a;b'; -- comment; with semicolon\nSELECT 2;\nSELECT (1); "
    )
    assert stmts == ["SELECT 'a;b'", "SELECT 2", "SELECT (1)"]


def test_run_statement_select_and_ddl(engine):
    out = run_statement(engine, "SELECT 1 AS one, 'x' AS s FORMAT CSVWithNames")
    assert out.splitlines()[:2] == ["one,s", "1,x"]
    assert "rows in set" in out
    out = run_statement(engine, "SELECT count() AS n FROM numbers(5) FORMAT TSV")
    assert out.splitlines()[0] == "5"
    # a routed statement returns Ok./rendered output, not a crash
    run_statement(engine, "CREATE TABLE cli_t (k UInt32) ENGINE = Memory")
    run_statement(engine, "INSERT INTO cli_t VALUES (1), (2)")
    out = run_statement(engine, "SELECT sum(k) AS s FROM cli_t FORMAT JSONEachRow")
    assert '{"s": 3}' in out
    run_statement(engine, "DROP TABLE cli_t")
