"""Airflow ETL lab replay (clusters/airflow_and_ch/airflow/dags/etl.py:
17-115) — the reference's single largest code file, driven HTTP-only.

The DAG is three PythonOperators chained create_table >> api_to_ch >>
check_results: drop/create the ``default.netflix`` table, bulk-insert a
downloaded CSV dataframe, then log ``select count()``. The reference
client speaks the native protocol; this replay uses the engine's
ClickHouse-compatible HTTP interface for every statement, including the
``?query=INSERT … FORMAT CSVWithNames`` + CSV-body bulk-insert shape.
The web download is replaced by a local CSV with the dataset's exact
column set (no network in the sandbox); everything else is verbatim.
"""

import urllib.parse
import urllib.request

import pytest

DROP_TABLE = "drop table if exists default.netflix"
# etl.py:17-35 verbatim
CREATE_TABLE = """
create table default.netflix
(
    show_id String,
    type String,
    title String,
    director String,
    cast String,
    country String,
    date_added String,
    release_year UInt16,
    rating String,
    duration String,
    listed_in String,
    description String
)
engine=MergeTree
order by tuple()
"""

# netflix-titles.csv shape (practiceprobs dataset): quoted fields with
# embedded commas, empty fields — the cases a naive split would break on
NETFLIX_CSV = """\
show_id,type,title,director,cast,country,date_added,release_year,rating,duration,listed_in,description
s1,Movie,Dick Johnson Is Dead,Kirsten Johnson,,United States,"September 25, 2021",2020,PG-13,90 min,Documentaries,As her father nears the end of his life.
s2,TV Show,Blood & Water,,"Ama Qamata, Khosi Ngema",South Africa,"September 24, 2021",2021,TV-MA,2 Seasons,"International TV Shows, TV Dramas",After crossing paths at a party.
s3,TV Show,Ganglands,Julien Leclercq,"Sami Bouajila, Tracy Gotoas",,"September 24, 2021",2021,TV-MA,1 Season,"Crime TV Shows, International TV Shows",To protect his family from a powerful drug lord.
s4,TV Show,Jailbirds New Orleans,,,,"September 24, 2021",2021,TV-MA,1 Season,"Docuseries, Reality TV",Feuds flare up and tears flow.
s5,TV Show,Kota Factory,,"Mayur More, Jitendra Kumar",India,"September 24, 2021",2021,TV-MA,2 Seasons,"International TV Shows, Romantic TV Shows",In a city of coaching centers.
s6,Movie,Midnight Mass,Mike Flanagan,"Kate Siegel, Zach Gilford",,"September 24, 2021",2021,TV-MA,1 Season,"TV Dramas, TV Horror",The arrival of a charismatic young priest.
"""


@pytest.fixture
def http_base(engine):
    from otus_clickhouse_spark.http_server import serve

    server = serve(engine, port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    engine.tables.pop("netflix", None)


def _post(base: str, statement: str, data: str | None = None) -> str:
    if data is None:
        req = urllib.request.Request(f"{base}/", data=statement.encode())
    else:  # query in the URL param, data block in the body (CH bulk insert)
        q = urllib.parse.quote(statement)
        req = urllib.request.Request(f"{base}/?query={q}", data=data.encode())
    return urllib.request.urlopen(req).read().decode()


def _get(base: str, query: str) -> str:
    return urllib.request.urlopen(
        f"{base}/?query={urllib.parse.quote(query)}"
    ).read().decode()


def test_etl_dag_replay_http_only(engine, http_base, tmp_path):
    # task 1: create_table (etl.py:37-52)
    _post(http_base, DROP_TABLE)
    _post(http_base, CREATE_TABLE)
    engine.tables["netflix"].path = str(tmp_path / "netflix")
    assert "netflix" in engine.tables
    assert engine.table("netflix").count() == 0

    # task 2: api_to_ch (etl.py:54-70) — dataset CSV pushed as one
    # bulk-insert block, column-name-mapped like insert_dataframe
    _post(
        http_base,
        "INSERT INTO default.netflix FORMAT CSVWithNames",
        data=NETFLIX_CSV,
    )

    # task 3: check_results (etl.py:72-84)
    assert _get(http_base, "select count() from default.netflix").strip() == "6"

    # the typed schema survived the HTTP round-trip: UInt16 release_year
    # aggregates numerically, quoted commas stayed inside their fields
    out = _get(
        http_base,
        "select title from default.netflix where release_year = 2020"
        " FORMAT TabSeparated",
    ).strip()
    assert out == "Dick Johnson Is Dead"
    row = engine.sql(
        "SELECT cast, listed_in FROM netflix WHERE show_id = 's2'"
    ).collect()[0]
    assert row["cast"] == "Ama Qamata, Khosi Ngema"
    assert row["listed_in"] == "International TV Shows, TV Dramas"
    assert dict(engine.table("netflix").dtypes)["release_year"] == "int"

    # DAG re-run is idempotent: drop-if-exists → create → reload
    _post(http_base, DROP_TABLE)
    _post(http_base, CREATE_TABLE)
    engine.tables["netflix"].path = str(tmp_path / "netflix2")
    _post(
        http_base,
        "INSERT INTO default.netflix FORMAT CSVWithNames",
        data=NETFLIX_CSV,
    )
    assert _get(http_base, "select count() from default.netflix").strip() == "6"


def test_inline_format_insert_variants(engine, tmp_path):
    """INSERT … FORMAT <fmt> with an inline data block — CSV without
    names, JSONEachRow, and a partial column list falling back to
    declared defaults."""
    engine.execute("DROP TABLE IF EXISTS fmt_ins")
    engine.execute(
        "CREATE TABLE fmt_ins (id UInt32, name String, score Float64 DEFAULT 1.5) "
        "ENGINE = MergeTree ORDER BY id"
    )
    engine.tables["fmt_ins"].path = str(tmp_path / "fmt_ins")
    try:
        engine.execute("INSERT INTO fmt_ins FORMAT CSV\n1,alpha,0.5\n2,beta,2.5")
        engine.execute('INSERT INTO fmt_ins FORMAT JSONEachRow\n{"id": 3, "name": "gamma", "score": 9.0}')
        engine.execute("INSERT INTO fmt_ins (id, name) FORMAT CSV\n4,delta")
        rows = {r.id: (r.name, r.score) for r in engine.table("fmt_ins").collect()}
        assert rows == {
            1: ("alpha", 0.5),
            2: ("beta", 2.5),
            3: ("gamma", 9.0),
            4: ("delta", 1.5),  # omitted column → DEFAULT expr
        }
    finally:
        engine.execute("DROP TABLE IF EXISTS fmt_ins")


def test_inline_format_insert_permuted_columns(engine, tmp_path):
    """An explicit column list binds inline-data fields in the
    STATEMENT's order, not the declared one — `INSERT INTO t (name, id)`
    must parse the first CSV field as name. ClickHouse accepts the
    permuted form; binding it declared-order is silent corruption."""
    engine.execute("DROP TABLE IF EXISTS fmt_perm")
    engine.execute(
        "CREATE TABLE fmt_perm (id UInt32, name String, score Float64 DEFAULT 1.5) "
        "ENGINE = MergeTree ORDER BY id"
    )
    engine.tables["fmt_perm"].path = str(tmp_path / "fmt_perm")
    try:
        # full column set, permuted
        engine.execute("INSERT INTO fmt_perm (name, score, id) FORMAT CSV\nalpha,0.5,1")
        # partial column set, permuted
        engine.execute("INSERT INTO fmt_perm (name, id) FORMAT CSV\nbeta,2")
        rows = {r.id: (r.name, r.score) for r in engine.table("fmt_perm").collect()}
        assert rows == {1: ("alpha", 0.5), 2: ("beta", 1.5)}
    finally:
        engine.execute("DROP TABLE IF EXISTS fmt_perm")


def test_inline_format_insert_unknown_column_raises(engine, tmp_path):
    engine.execute("DROP TABLE IF EXISTS fmt_unk")
    engine.execute(
        "CREATE TABLE fmt_unk (id UInt32, name String) ENGINE = MergeTree ORDER BY id"
    )
    engine.tables["fmt_unk"].path = str(tmp_path / "fmt_unk")
    try:
        import pytest as _pytest

        with _pytest.raises(KeyError, match="unknown"):
            engine.execute("INSERT INTO fmt_unk (id, nope) FORMAT CSV\n1,x")
    finally:
        engine.execute("DROP TABLE IF EXISTS fmt_unk")


def test_inline_format_insert_spool_cleaned(engine, tmp_path):
    """The temp spool behind an inline-data INSERT is unlinked once the
    block is materialized — no per-statement temp-file leak."""
    import glob
    import os
    import tempfile

    engine.execute("DROP TABLE IF EXISTS fmt_spool")
    engine.execute(
        "CREATE TABLE fmt_spool (id UInt32, name String) ENGINE = MergeTree ORDER BY id"
    )
    engine.tables["fmt_spool"].path = str(tmp_path / "fmt_spool")
    try:
        pat = os.path.join(tempfile.gettempdir(), "*.dat")
        before = set(glob.glob(pat))
        engine.execute("INSERT INTO fmt_spool FORMAT CSV\n1,a\n2,b")
        assert set(glob.glob(pat)) == before
        assert engine.table("fmt_spool").count() == 2
    finally:
        engine.execute("DROP TABLE IF EXISTS fmt_spool")


def test_foreign_db_qualifier_errors(engine, tmp_path):
    """`DROP TABLE otherdb.t` / `INSERT INTO otherdb.t` must error, not
    silently act on `t` in the flat namespace (only `default.` is
    transparent, matching translate()'s rewrite)."""
    import pytest as _pytest

    engine.execute("DROP TABLE IF EXISTS qual_t")
    engine.execute(
        "CREATE TABLE qual_t (id UInt32) ENGINE = MergeTree ORDER BY id"
    )
    engine.tables["qual_t"].path = str(tmp_path / "qual_t")
    try:
        with _pytest.raises(KeyError, match="unknown database"):
            engine.execute("DROP TABLE otherdb.qual_t")
        with _pytest.raises(KeyError, match="unknown database"):
            engine.execute("INSERT INTO otherdb.qual_t VALUES (1)")
        with _pytest.raises(KeyError, match="unknown database"):
            engine.execute("INSERT INTO otherdb.qual_t FORMAT CSV\n1")
        assert "qual_t" in engine.tables  # survived the failed DROP
        engine.execute("DROP TABLE default.qual_t")  # default. still transparent
        assert "qual_t" not in engine.tables
    finally:
        engine.execute("DROP TABLE IF EXISTS qual_t")
