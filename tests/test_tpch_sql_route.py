"""TPC-H depth through the ClickHouse-SQL front end.

A reference user types SQL at the CLI/HTTP interface (engine.sql with
the CH dialect), not the DataFrame API. These tests run representative
TPC-H-adapted queries as SQL TEXT through the engine and compare the
rows against the registry's DataFrame implementations — proving the
dialect layer (rewrites, FINAL/SAMPLE-free ANSI passthrough, CH
function names where used) survives deep join trees, correlated
EXISTS, scalar subqueries, and window formulations.
"""

from pyspark.sql import functions as F  # noqa: F401


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_route_h04_exists(engine, spark, sf_dir):
    from otus_clickhouse_spark.queries_tpch import h04_late_order_priority

    got = engine.sql(
        """
        SELECT o.o_orderpriority, count() AS order_count
        FROM orders o
        WHERE o.o_orderdate >= toDateTime('1996-07-01 00:00:00')
          AND o.o_orderdate < toDateTime('1996-10-01 00:00:00')
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        GROUP BY o.o_orderpriority
        """
    )
    assert _rows(got) == _rows(h04_late_order_priority(spark, sf_dir))


def test_sql_route_h17_scalar_subquery(engine, spark, sf_dir):
    from otus_clickhouse_spark.queries_tpch import h17_small_quantity_revenue

    got = engine.sql(
        """
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        """
    )
    assert _rows(got) == _rows(h17_small_quantity_revenue(spark, sf_dir))


def test_sql_route_h21_window(engine, spark, sf_dir):
    from otus_clickhouse_spark.queries_tpch import h21_waiting_suppliers

    got = engine.sql(
        """
        WITH ordinfo AS (
          SELECT l_orderkey, max(l_shipdate) AS max_ship,
                 uniqExact(l_suppkey) AS n_supp
          FROM lineitem GROUP BY l_orderkey)
        SELECT s.s_name, count() AS numwait
        FROM lineitem l
        JOIN ordinfo oi ON oi.l_orderkey = l.l_orderkey AND l.l_shipdate = oi.max_ship
        JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE oi.n_supp >= 2
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name LIMIT 20
        """
    )
    assert _rows(got) == _rows(h21_waiting_suppliers(spark, sf_dir))


def test_sql_route_h13_left_join_distribution(engine, spark, sf_dir):
    from otus_clickhouse_spark.queries_tpch import h13_customer_distribution

    got = engine.sql(
        """
        SELECT c_count, count() AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                             AND o.o_orderpriority != '1-URGENT'
          GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
        """
    )
    assert _rows(got) == _rows(h13_customer_distribution(spark, sf_dir))


def test_sql_route_h22_anti_join(engine, spark, sf_dir):
    from otus_clickhouse_spark.queries_tpch import h22_global_sales_opportunity

    got = engine.sql(
        """
        WITH custsel AS (
          SELECT c_custkey, c_acctbal, toString(c_custkey % 7) AS cntrycode
          FROM customer
          WHERE toString(c_custkey % 7) IN ('1', '3', '5'))
        SELECT cntrycode, count() AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        FROM custsel c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM custsel WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= toDateTime('2000-01-01 00:00:00'))
        GROUP BY cntrycode
        """
    )
    assert _rows(got) == _rows(h22_global_sales_opportunity(spark, sf_dir))
