"""Unit tests for the custom operators: ASOF/ANY/PASTE joins, WITH FILL."""

import datetime as dt

from pyspark.sql import functions as F

from otus_clickhouse_spark.operators.asof import asof_join
from otus_clickhouse_spark.operators.joins import any_join, paste_join
from otus_clickhouse_spark.operators.with_fill import with_fill


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inner(spark):
    quotes = spark.createDataFrame(
        [("A", ts("2024-01-01 10:00:00"), 100.0), ("A", ts("2024-01-01 10:05:00"), 101.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:02:00"), 5),   # matches 10:00 quote
            ("A", ts("2024-01-01 10:05:00"), 7),   # exact match → 10:05
            ("A", ts("2024-01-01 09:59:00"), 9),   # no quote before → dropped (inner)
            ("B", ts("2024-01-01 10:02:00"), 1),   # no quotes for B → dropped
        ],
        "sym string, tts timestamp, qty int",
    )
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts").collect()
    got = {(r.qty): r.r_px for r in out}
    assert got == {5: 100.0, 7: 101.0}


def test_asof_left_and_exclusive(spark):
    quotes = spark.createDataFrame(
        [("A", ts("2024-01-01 10:05:00"), 101.0)], "sym string, qts timestamp, px double"
    )
    trades = spark.createDataFrame(
        [("A", ts("2024-01-01 10:05:00"), 7)], "sym string, tts timestamp, qty int"
    )
    left = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", how="left",
                     allow_exact_matches=False).collect()
    assert len(left) == 1 and left[0].r_px is None


def test_asof_forward(spark):
    quotes = spark.createDataFrame(
        [("A", ts("2024-01-01 10:05:00"), 101.0)], "sym string, qts timestamp, px double"
    )
    trades = spark.createDataFrame(
        [("A", ts("2024-01-01 10:00:00"), 5)], "sym string, tts timestamp, qty int"
    )
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
                    direction="forward").collect()
    assert len(out) == 1 and out[0].r_px == 101.0


def test_any_join_no_fanout(spark):
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, "a", 1), (1, "b", 2), (2, "c", 1)], "k int, v string, ver int")
    out = any_join(left, right, ["k"], take_last_by="ver").orderBy("k").collect()
    assert len(out) == 2  # no fan-out
    assert out[0].v == "b"  # take_last_by=ver picks highest version


def test_paste_join_zips_by_position(spark):
    a = spark.createDataFrame([("x",), ("y",), ("z",)], "l string")
    b = spark.createDataFrame([(1,), (2,), (3,)], "r int")
    out = paste_join(a, b, ["l"], [F.col("r").desc()]).orderBy("l").collect()
    assert [(r.l, r.r) for r in out] == [("x", 3), ("y", 2), ("z", 1)]


def test_paste_join_rejects_reserved_columns(spark):
    """Inputs already carrying a helper column (__pos/__pid/…) would be
    silently overwritten by withColumn — rejected up front instead."""
    import pytest as _pytest

    a = spark.createDataFrame([("x", 9)], "l string, __pos int")
    b = spark.createDataFrame([(1,)], "r int")
    with _pytest.raises(ValueError, match="reserved helper column"):
        paste_join(a, b, ["l"], ["r"]).collect()


def test_with_fill_numeric(spark):
    df = spark.createDataFrame([(1, 10), (4, 40)], "k int, v int")
    out = with_fill(df, "k", step=1, fill_values={"v": 0}).orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, 10), (2, 0), (3, 0), (4, 40)]


def test_with_fill_dates(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 1), (dt.date(2024, 1, 4), 4)], "d date, n int"
    )
    out = with_fill(df, "d", step="1 day", fill_values={"n": 0}).orderBy("d").collect()
    assert len(out) == 4 and out[1].n == 0


def test_with_fill_broadcast_guard(spark, sf_dir):
    """The spine join broadcasts post-aggregation data (normal WITH FILL
    regime) but must NOT broadcast a large raw table — a 100 TB scan on
    the data side would OOM the executors."""
    import os

    from pyspark.sql import functions as F

    from otus_clickhouse_spark.io import read_table

    li = read_table(spark, os.path.join(sf_dir, "lineitem.parquet"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        raw = with_fill(li.select(F.col("l_linenumber").alias("k"), "l_quantity"), "k", step=1)
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in raw_plan, "raw table must not broadcast"
        agg = with_fill(
            li.groupBy(F.col("l_linenumber").alias("k")).agg(F.sum("l_quantity").alias("q")),
            "k",
            step=1,
        )
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in agg_plan, "aggregated data side should broadcast"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_graphite_rollup(spark):
    from otus_clickhouse_spark.operators.graphite import (
        GraphitePattern,
        Retention,
        graphite_rollup,
    )

    rows = [
        # old rows (age >= 100s vs now=1000): bucket to 60s precision
        ("cpu.load", 100, 1.0),
        ("cpu.load", 130, 3.0),
        # recent row: 10s precision
        ("cpu.load", 955, 5.0),
        # default-pattern path, old: avg
        ("mem.used", 110, 2.0),
        ("mem.used", 130, 4.0),
    ]
    df = spark.createDataFrame(
        [(p, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), v) for p, t, v in rows],
        "path string, time timestamp, value double",
    )
    patterns = [
        GraphitePattern("^cpu\\.", "sum", [Retention(0, 10), Retention(100, 60)]),
        GraphitePattern(None, "avg", [Retention(0, 10), Retention(100, 60)]),
    ]
    now = dt.datetime.fromtimestamp(1000, dt.timezone.utc).replace(tzinfo=None)
    out = graphite_rollup(df, patterns, now, ts_col=None)
    got = {(r["path"], int(r["time"].timestamp()), r["value"]) for r in out.collect()}
    assert got == {
        ("cpu.load", 60, 1.0),
        ("cpu.load", 120, 3.0),
        ("cpu.load", 950, 5.0),
        ("mem.used", 60, 2.0),
        ("mem.used", 120, 4.0),
    }


def test_with_fill_interpolate(engine):
    """WITH FILL … INTERPOLATE (lecture_20.md WITH FILL surface +
    ClickHouse INTERPOLATE): carry-forward and linear progression."""
    rows = engine.sql(
        "SELECT n, v, lvl FROM (VALUES (1, 10.0, 100), (4, 40.0, 400), (6, 60.0, 600)) "
        "AS t(n, v, lvl) "
        "ORDER BY n WITH FILL FROM 1 TO 7 INTERPOLATE (v, lvl AS lvl + 10)"
    ).collect()
    got = {r.n: (r.v, r.lvl) for r in rows}
    assert got[1] == (10.0, 100)
    assert got[2] == (10.0, 110)  # v carried, lvl = prev + 10 per filled row
    assert got[3] == (10.0, 120)
    assert got[4] == (40.0, 400)
    assert got[5] == (40.0, 410)
    assert got[6] == (60.0, 600)
    assert 7 not in got  # CH WITH FILL TO bound is exclusive


def test_registry_table_cache_reuses_dataframe_per_session(spark, sf_dir):
    """t() opens each (session, path) once and returns the same lazy
    DataFrame — metadata reuse only (r12): results must come from the
    parquet on every action, and distinct paths must never share an
    entry."""
    from otus_clickhouse_spark.queries import t

    a = t(spark, sf_dir, "nation")
    b = t(spark, sf_dir, "nation")
    assert a is b  # same plan object, no re-listing/inference
    c = t(spark, sf_dir, "region")
    assert c is not a
    # the cached plan still computes from the file (not a materialized copy)
    assert a.count() == spark.read.parquet(f"{sf_dir}/nation.parquet").count()


def test_registry_table_cache_evicts_dead_sessions(spark, sf_dir):
    """Entries whose session has stopped are swept on the next cache
    miss (ADVICE r12: dead-session entries pinned the old session and
    its JVM-side plans forever in a session-cycling driver)."""
    from otus_clickhouse_spark import queries as q

    class _DeadSession:  # _session_stopped() -> True (no sparkContext)
        pass

    dead = _DeadSession()
    q._TABLES[(id(dead), "/dead/path.parquet")] = (dead, None)
    # force a miss (an earlier test may have already cached this table)
    q._TABLES.pop((id(spark), f"{sf_dir}/region.parquet"), None)
    live = q.t(spark, sf_dir, "region")  # the miss sweeps dead entries
    assert (id(dead), "/dead/path.parquet") not in q._TABLES
    assert live is q.t(spark, sf_dir, "region")  # live entry survived


def test_rebalance_probe_memo_is_bounded(spark, sf_dir, monkeypatch):
    """_NPARTS never grows past its cap (ADVICE r12: one entry per
    fresh leaf relation is unbounded over a long-lived session)."""
    import otus_clickhouse_spark.io as io

    monkeypatch.setattr(io, "_NPARTS_MAX", 2)
    io._NPARTS.clear()
    for _ in range(4):  # each re-read mints fresh expr-ids -> new key
        df = spark.read.parquet(f"{sf_dir}/nation.parquet")
        n = io._num_partitions(df)
        assert n == df.rdd.getNumPartitions()
        assert len(io._NPARTS) <= 2
    io._NPARTS.clear()


def test_rebalance_probe_memo_matches_direct_probe_and_respects_fresh_reads(spark, sf_dir):
    """The memoized partition probe (r12) must return exactly what
    df.rdd.getNumPartitions() returns, hit its cache for semantically
    identical plans over the same relation, and take a FRESH probe for
    a re-read of the same path (the stale-file-layout guard for
    engine-managed tables that mutations rewrite)."""
    import otus_clickhouse_spark.io as io

    base = spark.read.parquet(f"{sf_dir}/nation.parquet")
    d1 = base.select("n_nationkey")
    assert io._num_partitions(d1) == d1.rdd.getNumPartitions()
    before = len(io._NPARTS)
    io._num_partitions(base.select("n_nationkey"))  # same semantics, same leaf
    assert len(io._NPARTS) == before  # cache hit, no new entry
    fresh = spark.read.parquet(f"{sf_dir}/nation.parquet")
    io._num_partitions(fresh.select("n_nationkey"))  # new leaf relation
    assert len(io._NPARTS) == before + 1  # fresh read -> fresh probe entry
    # and the rebalance decision built on the memo keeps its contract:
    # output partitions >= defaultParallelism for a small scan
    out = io.rebalance(base.select("n_nationkey"))
    assert out.rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 4
    )
