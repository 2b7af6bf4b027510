"""Sources & write path: formats, brace globs, Engine.insert (EP3)."""

import os

from pyspark.sql import functions as F

from otus_clickhouse_spark.sources.readers import _expand_braces, file_table


def test_brace_expansion():
    assert _expand_braces("s3a://b/part-{0..2}.csv") == "s3a://b/part-{0,1,2}.csv"
    assert _expand_braces("x/{00..03}.parquet") == "x/{00,01,02,03}.parquet"
    assert _expand_braces("plain.csv") == "plain.csv"


def test_file_table_csv_roundtrip(spark, tmp_path):
    """file(path, CSVWithNames) read/write (S5/S12; lecture_09.md:374-422)."""
    p = str(tmp_path / "csv_out")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    df.write.option("header", "true").csv(p)
    back = file_table(spark, p, "CSVWithNames")
    assert back.count() == 2 and set(back.columns) == {"id", "v"}


def test_file_table_jsoneachrow(spark, tmp_path):
    """JSONEachRow format (S12; lecture_03.md:209-213)."""
    p = str(tmp_path / "json_out")
    spark.createDataFrame([(1, "x")], "id int, v string").write.json(p)
    back = file_table(spark, p, "JSONEachRow")
    assert back.count() == 1


def test_file_table_orc_roundtrip(spark, tmp_path):
    """ORC input format (S12 — CH `Formats` supports ORC natively; so
    does Spark, executor-side scan with pushdown like parquet)."""
    p = str(tmp_path / "orc_out")
    spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string").write.orc(p)
    back = file_table(spark, p, "ORC")
    assert back.count() == 3 and set(back.columns) == {"id", "v"}


def test_file_table_arrow_roundtrip(spark, tmp_path):
    """Arrow / ArrowStream input formats (S12): IPC file and stream
    layouts, plus glob over multiple files."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    t = pa.table({"id": [1, 2, 3], "v": ["a", "b", "c"]})
    fp = str(tmp_path / "part0.arrow")
    with ipc.new_file(fp, t.schema) as w:
        w.write_table(t)
    back = file_table(spark, fp, "Arrow")
    assert back.count() == 3 and set(back.columns) == {"id", "v"}

    sp = str(tmp_path / "part1.arrows")
    with ipc.new_stream(sp, t.schema) as w:
        w.write_table(t)
    back = file_table(spark, sp, "ArrowStream")
    assert back.count() == 3

    both = file_table(spark, str(tmp_path / "part*.arrow*"), "Arrow")
    assert both.count() == 6


def test_engine_insert_sorted_partitioned(spark, tmp_path):
    """EP3 insert path (lecture_04.md:9-52): sorted-within-partition,
    PARTITION BY directory layout, appendable, readable back."""
    from otus_clickhouse_spark.engine import Engine, TableDef

    eng = Engine(spark)
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(3, 202401, "c"), (1, 202401, "a"), (2, 202402, "b")], "k int, ym int, v string"
    )
    df.write.partitionBy("ym").parquet(path)
    td = TableDef(name="ins_t", path=path, order_by=("k",), partition_by=("ym",))
    eng.register_table(td)
    eng.insert("ins_t", spark.createDataFrame([(9, 202402, "z")], "k int, ym int, v string"))
    assert eng.table("ins_t").count() == 4
    # partition directories exist → partition pruning works on ym
    assert os.path.isdir(os.path.join(path, "ym=202401"))
    pruned = eng.table("ins_t").where(F.col("ym") == 202401)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "ym=202401" in plan or "PartitionFilters" in plan


def test_url_table_file_scheme(spark, tmp_path):
    # S4 url(): file:// exercises the fetch→read path network-free
    from otus_clickhouse_spark.sources.readers import url_table

    p = tmp_path / "data.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = url_table(spark, f"file://{p}", "CSVWithNames")
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (2, "y")]


def test_named_collection_jdbc_sql(engine, spark, tmp_path):
    """D14 named collections (hw19.md:37-48) + S15/S16 SQL surface: the
    jdbc()/postgresql() table functions and external-DB engines resolve
    a CREATE NAMED COLLECTION by name. Derby stands in for the server
    (same JDBC code path, different URL)."""
    url = f"jdbc:derby:{tmp_path}/ncdb;create=true"
    spark.range(12).selectExpr("id", "concat('v', id) AS val").write.format("jdbc").option(
        "url", url
    ).option("dbtable", "nc_tbl").option(
        "driver", "org.apache.derby.jdbc.EmbeddedDriver"
    ).option("createTableColumnTypes", "val VARCHAR(32)").mode("overwrite").save()

    engine.execute(
        f"CREATE NAMED COLLECTION myderby AS url = '{url}', "
        "driver = 'org.apache.derby.jdbc.EmbeddedDriver', password = 'sekret'"
    )
    # named-collection call with per-call override (hw19.md:48 shape)
    n = engine.sql("SELECT count(*) AS n FROM jdbc(myderby, table = 'nc_tbl')").collect()[0].n
    assert n == 12
    # positional call (hw19.md:46 shape, url form)
    n2 = engine.sql(
        f"SELECT count(*) AS n FROM jdbc('{url}', 'nc_tbl', "
        "driver = 'org.apache.derby.jdbc.EmbeddedDriver')"
    ).collect()[0].n
    assert n2 == 12
    # ENGINE = JDBC DDL proxy (S16; hw19.md:63-81 engine form)
    engine.execute(
        "CREATE TABLE nc_proxy (id UInt64, val String) "
        "ENGINE = JDBC(myderby, table = 'nc_tbl')"
    )
    assert engine.sql("SELECT max(id) AS m FROM nc_proxy").collect()[0].m == 11
    # catalog surfaces: SHOW + system view with masked secrets
    assert "myderby" in engine.execute("SHOW NAMED COLLECTIONS")
    row = engine.sql(
        "SELECT collection FROM system.named_collections WHERE name = 'myderby'"
    ).collect()[0]
    assert "[HIDDEN]" in row.collection and "sekret" not in row.collection
    engine.execute("ALTER NAMED COLLECTION myderby SET password = 'sekret2'")
    assert engine._named_collections["myderby"]["password"] == "sekret2"
    engine.execute("DROP TABLE nc_proxy")
    engine.execute("DROP NAMED COLLECTION myderby")
    assert "myderby" not in engine.execute("SHOW NAMED COLLECTIONS")


def test_jdbc_roundtrip_via_derby(spark, tmp_path):
    """S7/S15/S16 JDBC read path (hw19.md:44-118): write/read an external
    RDBMS table through Spark JDBC, using the bundled Derby as the
    stand-in server (same code path as PostgreSQL, different URL)."""
    from otus_clickhouse_spark.sources.readers import remote_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    src = spark.range(20).selectExpr("id", "concat('n', id) AS name")
    src.write.format("jdbc").option("url", url).option("dbtable", "ext_tbl").option(
        "driver", "org.apache.derby.jdbc.EmbeddedDriver"
    ).option("createTableColumnTypes", "name VARCHAR(64)").mode("overwrite").save()
    back = remote_jdbc(
        spark, url, "ext_tbl", driver="org.apache.derby.jdbc.EmbeddedDriver"
    )
    assert back.count() == 20
    assert back.where("name = 'n7'").collect()[0].id == 7


def test_file_table_reads_gzip_transparently(spark, tmp_path):
    """ClickHouse file() auto-detects compression from the extension
    (file('x.csv.gz', CSV)); Spark's Hadoop codecs give the same
    behavior for .gz — pin it so the surface stays covered."""
    import gzip

    from otus_clickhouse_spark.sources.readers import file_table

    p = tmp_path / "data.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("a,b\n1,x\n2,y\n")
    rows = sorted(map(tuple, file_table(spark, str(p), "CSVWithNames").collect()))
    assert rows == [(1, "x"), (2, "y")]

    j = tmp_path / "rows.jsonl.gz"
    with gzip.open(j, "wt") as f:
        f.write('{"k": 1}\n{"k": 2}\n')
    got = sorted(r.k for r in file_table(spark, str(j), "JSONEachRow").collect())
    assert got == [1, 2]


def test_filecluster_table_function(engine, tmp_path):
    """fileCluster('cluster', path, fmt) (lecture_11.md:411): CH fans the
    read over cluster nodes; Spark's reader already parallelizes, so the
    cluster argument drops and the semantics match file()."""
    p = str(tmp_path / "fc.csv")
    with open(p, "w") as fh:
        fh.write("a,b\n1,x\n2,y\n")
    rows = engine.sql(
        f"SELECT * FROM fileCluster('mycluster', '{p}', 'CSVWithNames') ORDER BY a"
    ).collect()
    assert [(int(r.a), r.b) for r in rows] == [(1, "x"), (2, "y")]


def test_format_inline_table_function(engine):
    """lecture_03.md:358-366 verbatim: DESC format(...) infers the
    inline literal's schema for JSONEachRow / CSV / Values ($$-quoted),
    and FROM format(...) serves the rows."""
    rows = engine.execute(
        'DESC format(JSONEachRow, \'{"int" : 42, "float" : 42.42, "string" : "Hello, World!"}\')'
    )
    got = {r.col_name: r.data_type for r in rows}
    assert got["int"] == "bigint" and got["float"] == "double" and got["string"] == "string"
    rows = engine.execute("DESC format(CSV, '42,42.42,true,\"Hello,World!\"')")
    assert [r.data_type for r in rows] == ["int", "double", "boolean", "string"]
    rows = engine.execute("DESC format(Values, $$(42, 42.42, true, 'Hello,World!')$$)")
    assert [r.col_name for r in rows] == ["c1", "c2", "c3", "c4"]
    assert [r.data_type for r in rows] == ["int", "decimal(4,2)", "boolean", "string"]
    # the table-function form serves rows too
    got = engine.sql(
        "SELECT string AS s FROM format(JSONEachRow, '{\"int\" : 1, \"string\" : \"x\"}')"
    ).collect()
    assert got[0].s == "x"
