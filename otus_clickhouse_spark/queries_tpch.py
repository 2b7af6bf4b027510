"""TPC-H-adapted 22-query suite (h01–h22) over the synthetic star schema.

The reference course benchmarks ClickHouse with TPC-H-shaped analytics
(lectures/lecture_10.md OLAP workloads; homeworks build star-schema
queries over MergeTree). This module locks the full classic suite —
deep join trees, correlated EXISTS / scalar subqueries, group-filter
HAVING, distribution queries — as driver-checkable (Spark, DuckDB
oracle) pairs.

Adaptations to the synthetic schema (TESTDATA.md):
- there is no ``partsupp`` table: it is derived from lineitem as the
  distinct (l_partkey, l_suppkey) pairs with
  ``ps_supplycost = min(l_extendedprice / l_quantity)`` and
  ``ps_availqty = round(sum(l_quantity))``. Same join topology and
  cardinality class as the real table, derivable identically on both
  engines (min/div are order-insensitive, so cross-engine doubles are
  bit-identical).
- lineitem has no commit/receipt dates: "late" predicates become
  ``l_shipdate > o_orderdate + INTERVAL``.
- customer has no phone: Q22's country code becomes
  ``c_custkey % 7``.

Scale notes (100 TB): explicit ``F.broadcast`` hints are reserved for
relations whose size is INDEPENDENT of scale factor — nation (25
rows), region (5 rows), and 1-row scalar aggregates. Everything that
grows with SF (orders, customer, supplier, part, and any key list or
aggregate derived from them) carries NO hint: at sf0.1 AQE's runtime
size check still broadcasts them for free, and at the 100 TB target
the same plan degrades gracefully to a shuffle join instead of
blowing Spark's 8 GB broadcast-relation cap. (A forced hint would
*disable* that size check — see tests/test_plans.py
``test_tpch_no_forced_broadcast_of_scale_tables``.) The only
unavoidable wide shuffles are the final group-bys on low-cardinality
keys and the derived partsupp build (one shuffle of (partkey,
suppkey) pairs, reused via a shared helper). Scalar subqueries are
computed as 1-row aggregates and broadcast-cross-joined — never
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from otus_clickhouse_spark.queries import query, t

# Derived partsupp relation — shared SQL text for oracles.
_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost,
         CAST(round(sum(l_quantity)) AS BIGINT) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
"""


def _partsupp(spark, sf_dir, part_keys=None, supp_keys=None):
    """Derived partsupp (see module docstring). One shuffle on the
    (partkey, suppkey) pair key; ~|distinct pairs| rows out.

    ``part_keys``/``supp_keys`` (1-column DataFrames) pre-restrict the
    build by semi-join BEFORE the pair aggregation — membership in the
    grouping key is row-wise, so filtering on it commutes with the agg
    and the surviving rows' supplycost/availqty are bit-identical to
    the unrestricted build. This is predicate pushdown through the
    derived aggregate: for a selective part filter (h02/h09/h20) it
    shrinks the pair shuffle ~10×, usually making the join back to
    the fact broadcast-able."""
    li = t(spark, sf_dir, "lineitem")
    if part_keys is not None:
        li = li.join(
            part_keys.toDF("__pk"), li.l_partkey == F.col("__pk"), "left_semi"
        )
    if supp_keys is not None:
        li = li.join(
            supp_keys.toDF("__sk"), li.l_suppkey == F.col("__sk"), "left_semi"
        )
    return (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
            F.round(F.sum("l_quantity")).cast("bigint").alias("ps_availqty"),
        )
    )


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ------------------------------------------------------------------ h01
@query(
    "h01_pricing_summary_full",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-08-06'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def h01_pricing_summary_full(spark, sf_dir):
    """TPC-H Q1 in full (incl. sum_charge): one scan, two-phase agg on a
    6-group key; the date filter pushes to parquet."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= _ts("2001-08-06"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ------------------------------------------------------------------ h02
@query(
    "h02_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL}),
    eu AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
             s.s_acctbal, s.s_name, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    mc AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM eu GROUP BY ps_partkey)
    SELECT round(eu.s_acctbal, 2) AS s_acctbal, eu.s_name, eu.n_name,
           p.p_partkey, p.p_name,
           CAST(floor(eu.ps_supplycost * 10000 + 0.5) AS BIGINT) AS supplycost_e4
    FROM part p
    JOIN eu ON eu.ps_partkey = p.p_partkey
    JOIN mc ON mc.ps_partkey = eu.ps_partkey AND eu.ps_supplycost = mc.min_cost
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def h02_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2: min-cost supplier per part in a region (correlated min
    subquery → groupBy + equi-join back). nation/region are broadcast
    by hint, supplier/part by AQE when they fit; the only mandatory
    shuffle is the partsupp build + per-part min."""
    p = t(spark, sf_dir, "part").where((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    ps = _partsupp(spark, sf_dir, part_keys=p.select("p_partkey"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    mc = eu.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        eu.join(mc, ["ps_partkey"])
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # integer ten-thousandths: floor of the same double is
            # bit-identical on both engines (round() half-up boundary
            # cases are not — 26.24125 rounds differently)
            F.floor(F.col("ps_supplycost") * 10000 + 0.5).cast("bigint").alias("supplycost_e4"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ------------------------------------------------------------------ h03
@query(
    "h03_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'AUTOMOBILE'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def h03_shipping_priority(spark, sf_dir):
    """TPC-H Q3 in full (both date cutoffs + priority column). orders/
    customer are filtered before the join and left unhinted — AQE
    broadcasts them while they fit, shuffles past the cap."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "AUTOMOBILE")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < _ts("1997-03-15"))
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _ts("1997-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ------------------------------------------------------------------ h04
@query(
    "h04_late_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01' AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def h04_late_order_priority(spark, sf_dir):
    """TPC-H Q4 with the 'late line' predicate adapted to
    shipdate > orderdate + 90d (no commit/receipt dates in the synthetic
    schema). EXISTS → left-semi join with a non-equi conjunct."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01")) & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(F.col("o_orderdate"), 90).cast("timestamp")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ------------------------------------------------------------------ h05
@query(
    "h05_local_supplier_volume",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def h05_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue where customer and supplier share a nation in a
    region. 5 joins; nation/region broadcast by hint, the SF-growing
    sides by AQE when small enough, then one 5-row group-by."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# ------------------------------------------------------------------ h06
@query(
    "h06_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 25
    """,
)
def h06_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 (1997 window variant of q06): all predicates push to the
    parquet scan; single partial+final agg, no shuffle of data rows."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & F.col("l_discount").between(0.03, 0.05)
        & (F.col("l_quantity") < 25)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


# ------------------------------------------------------------------ h07
@query(
    "h07_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def h07_volume_shipping(spark, sf_dir):
    """TPC-H Q7: bilateral trade volume by year. The nation pair
    disjunction is applied after the dim joins (Catalyst pushes each
    half to its side where possible); only the two 25-row nation
    scans are hint-broadcast."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# ------------------------------------------------------------------ h08
@query(
    "h08_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def h08_market_share(spark, sf_dir):
    """TPC-H Q8: national market share inside a region. 7 joins —
    nation/region hinted, the rest AQE-sized; conditional-sum ratio
    per year."""
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0)))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


# ------------------------------------------------------------------ h09
@query(
    "h09_product_profit",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL})
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) - ps.ps_supplycost * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN partsupp ps ON ps.ps_suppkey = l.l_suppkey AND ps.ps_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def h09_product_profit(spark, sf_dir):
    """TPC-H Q9: profit = revenue − supplycost·qty by nation/year for a
    part-name family. The derived partsupp joins back to lineitem on the
    composite (partkey, suppkey) key — at scale this is the one
    co-partitioned wide join; the filtered part/supplier/orders sides
    are AQE-sized (broadcast at small SF, shuffle at 100 TB)."""
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    ps = _partsupp(spark, sf_dir, part_keys=p.select("p_partkey"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("ps_supplycost") * F.col(
        "l_quantity"
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


# ------------------------------------------------------------------ h10
@query(
    "h10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, round(c.c_acctbal, 2), n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def h10_returned_items(spark, sf_dir):
    """TPC-H Q10: top customers by returned-item revenue in a quarter."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-10-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ------------------------------------------------------------------ h11
@query(
    "h11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL}),
    nat AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS val
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_5')
    SELECT ps_partkey, round(sum(val), 2) AS part_value
    FROM nat
    GROUP BY ps_partkey
    HAVING sum(val) > (SELECT sum(val) * 0.001 FROM nat)
    """,
)
def h11_important_stock(spark, sf_dir):
    """TPC-H Q11: parts holding an outsized share of one nation's stock
    value. The scalar threshold is a 1-row aggregate broadcast-joined
    onto the per-part sums — no driver-side collect."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    nat5_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi").select("s_suppkey")
    ps = _partsupp(spark, sf_dir, supp_keys=nat5_supp)
    nat = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"))
    )
    per_part = nat.groupBy("ps_partkey").agg(F.sum("val").alias("total_val"))
    threshold = nat.agg((F.sum("val") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold))
        .where(F.col("total_val") > F.col("threshold"))
        .select("ps_partkey", F.round("total_val", 2).alias("part_value"))
    )


# ------------------------------------------------------------------ h12
@query(
    "h12_late_shipment_modes",
    oracle="""
    SELECT l.l_returnflag,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def h12_late_shipment_modes(spark, sf_dir):
    """TPC-H Q12 with returnflag standing in for shipmode (absent):
    priority mix of late shipments."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60).cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


# ------------------------------------------------------------------ h13
@query(
    "h13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def h13_customer_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of per-customer order counts (left join
    keeps zero-order customers; the join-side filter stays in the ON
    clause, not WHERE — outer-join semantics preserved)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ------------------------------------------------------------------ h14
@query(
    "h14_promo_effect",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01' AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def h14_promo_effect(spark, sf_dir):
    """TPC-H Q14: promo revenue share in one month. part joins
    unhinted (AQE broadcasts while it fits)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-09-01")) & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    p = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("promo_revenue")
        )
    )


# ------------------------------------------------------------------ h15
@query(
    "h15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def h15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with max quarterly revenue. Revenue is
    rounded to cents before the max-equality comparison so the
    tie/selection is bit-stable across engines; the max is a 1-row agg
    broadcast back (the CREATE VIEW of the original maps to the CTE)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ------------------------------------------------------------------ h16
@query(
    "h16_parts_supplier_counts",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def h16_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16: supplier counts per (brand,type,size), excluding one
    brand/type and 'complaint' suppliers (negative acctbal stands in for
    the comment scan). NOT IN → anti-join (AQE broadcasts the small
    supplier key list at any SF where it fits)."""
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    ps = _partsupp(spark, sf_dir, part_keys=p.select("p_partkey"))
    bad_supp = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(bad_supp, ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


# ------------------------------------------------------------------ h17
@query(
    "h17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def h17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders. The correlated
    avg becomes a per-part aggregate joined back (shuffle carries
    (partkey, avg) pairs only)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ------------------------------------------------------------------ h18
@query(
    "h18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d'), round(o.o_totalprice, 2)
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def h18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18: customers with very large orders. IN-subquery →
    semi-join on the group-filtered order keys."""
    li = t(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("tot")).where(F.col("tot") > 200)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(big.select("l_orderkey"), ["l_orderkey"], "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ------------------------------------------------------------------ h19
@query(
    "h19_discounted_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def h19_discounted_revenue(spark, sf_dir):
    """TPC-H Q19: three OR'd brand/size/quantity predicate groups over
    the part join — the disjunction evaluates post-join in one codegen
    stage (mixed-side predicates can't push down)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# ------------------------------------------------------------------ h20
@query(
    "h20_promotion_candidates",
    oracle=f"""
    WITH partsupp AS ({_PS_SQL}),
    window_qty AS (
      SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey),
    qualifying AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN window_qty w ON w.l_partkey = ps.ps_partkey AND w.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND ps.ps_availqty > w.half_qty)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s.s_suppkey IN (SELECT ps_suppkey FROM qualifying)
    """,
)
def h20_promotion_candidates(spark, sf_dir):
    """TPC-H Q20: suppliers holding excess stock of a part family. The
    nested correlated subquery becomes: window-qty agg on the composite
    key → join to partsupp → semi-join into supplier."""
    li = t(spark, sf_dir, "lineitem")
    small = t(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select("p_partkey")
    ps = _partsupp(spark, sf_dir, part_keys=small)
    wq = (
        li.where((F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01")))
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    qualifying = (
        ps.join(small, ps.ps_partkey == F.col("p_partkey"), "left_semi")
        .join(wq, (ps.ps_partkey == wq.l_partkey) & (ps.ps_suppkey == wq.l_suppkey))
        .where(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


# ------------------------------------------------------------------ h21
@query(
    "h21_waiting_suppliers",
    oracle="""
    WITH ordinfo AS (
      SELECT l_orderkey, max(l_shipdate) AS max_ship, count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l
    JOIN ordinfo oi ON oi.l_orderkey = l.l_orderkey AND l.l_shipdate = oi.max_ship
    JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE oi.n_supp >= 2
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 20
    """,
)
def h21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 adapted: the supplier whose shipment closed out a
    multi-supplier 'F' order "kept the order waiting" (no receipt dates,
    so latest-shipper stands in for the late-committer EXISTS chain).

    The double EXISTS becomes per-order window functions over ONE
    shuffle of lineitem (max shipdate + distinct-supplier count via
    collect_set — bounded by lines-per-order, ~7, so window state is
    O(1) per row at any corpus size). 1.6× faster than the agg+join-back
    formulation (two lineitem scans) at sf0.1; identical rows."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    lw = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
    )
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    return (
        lw.where((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2))
        .join(o, lw.l_orderkey == o.o_orderkey, "left_semi")
        .join(s, lw.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ------------------------------------------------------------------ h22
@query(
    "h22_global_sales_opportunity",
    oracle="""
    WITH custsel AS (
      SELECT c_custkey, c_acctbal, CAST(c_custkey % 7 AS VARCHAR) AS cntrycode
      FROM customer
      WHERE CAST(c_custkey % 7 AS VARCHAR) IN ('1', '3', '5'))
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM custsel c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM custsel WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode
    """,
)
def h22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22: rich customers with no recent orders, grouped by a
    country-code surrogate (c_custkey % 7 — no phone column). Scalar avg
    broadcast; NOT EXISTS → anti-join on recent orders."""
    custsel = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal", (F.col("c_custkey") % 7).cast("string").alias("cntrycode"))
        .where(F.col("cntrycode").isin("1", "3", "5"))
    )
    avg_bal = custsel.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_bal"))
    recent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    return (
        custsel.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, custsel.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
