"""TPC-H suite, verbatim-SQL interface (x25-x40).

The round-1/2 surface carried four TPC-H shapes (Q5/Q13/Q21/Q22 as
x18/x21/x22/x23). This module completes the suite: every remaining
TPC-H query whose shape survives the synthetic schema (TESTDATA.md —
no partsupp table, no comment/phone/address/shipmode/commitdate
columns) runs here, adapted to the columns that exist but keeping the
operator shape that makes each query a benchmark classic. With
x112 (Q2, partsupp-free min-cost supplier) and x113 (Q11,
partsupp-free important stock) the suite is COMPLETE: all 22 TPC-H
queries run (Q5/Q13/Q21/Q22 live as x18/x21/x22/x23 in
queries/extended.py, the rest here).

Each query is ONE ANSI-SQL string executed verbatim by BOTH engines:
``spark.sql`` over ``tables.register_views`` temp views, and DuckDB
over the same parquet files (the oracle IS the same string). That
makes the whole suite a dialect-portability + correctness gate on the
SQL frontend, exactly the "switch engines and run every query you run
today" contract.

Determinism rules (same as queries/relational.py):
- money sums go through DECIMAL casts sized to the term's exact
  decimal width (2dp price; 4dp price x (1-disc); 6dp x (1+tax)) so
  the sum is order-independent, then CAST AS DOUBLE for display;
- l_quantity sums stay plain SUM: small integers are exact in double
  in any order;
- every ORDER BY ends in a unique column so LIMIT sets are total;
- EXTRACT results are CAST AS INT (engine-native widths differ).

Scale notes (local[32] checks correctness; the plan is the point):
Catalyst broadcast-joins every dimension (region/nation/part/
supplier/customer at TPC-H's 1:10:...:6M fan ratios), pushes the
date/brand/segment filters into the parquet scans, and plans the
correlated EXISTS / IN / scalar subqueries as semi-/anti-hash-joins
or 1-row broadcasts — assertions in tests/test_plans.py. AQE handles
the skewed l_orderkey groups in Q18 at real scale.

Reference parity: the reference (bsc-wdc/dislib) has no SQL frontend;
this suite is north-star surface for the "analytics engine" contract
(SURVEY.md §2.12), judged as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- x25: Q1 pricing summary report ---------------------------------
# Wide aggregate over the biggest table; the map-side partial agg is
# the whole game at scale (6 groups, no shuffle pressure).
_X25_SQL = """
    SELECT l_returnflag,
           l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

# --- x26: Q3 shipping-priority top orders ---------------------------
_X26_SQL = """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""

# --- x27: Q4 order-priority checking --------------------------------
# (no l_commitdate/l_receiptdate in the synthetic schema: the "late
# line" stand-in is a line shipped >60 days after the order date;
# the correlated-EXISTS → semi-join shape is the point.)
_X27_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

# --- x28: Q6 forecasting-revenue change -----------------------------
# The pushdown showcase: every predicate reaches the parquet scan,
# one global sum, zero joins.
_X28_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""

# --- x29: Q7 volume shipping between two nations --------------------
_X29_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""

# --- x30: Q8 national market share ----------------------------------
_X30_SQL = """
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE)
               AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey
          AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND s_nationkey = n2.n_nationkey
          AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""

# --- x31: Q9 product-type profit ------------------------------------
# (no partsupp/ps_supplycost: profit = discounted revenue; the
# part-name LIKE filter + per-nation-per-year rollup shape stays.)
_X31_SQL = """
    SELECT nation, o_year,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey
          AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""

# --- x32: Q10 returned-item reporting -------------------------------
_X32_SQL = """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1997-01-01'
      AND o_orderdate < DATE '1997-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""

# --- x33: Q12 shipping-mode line-priority count ---------------------
# (no l_shipmode/l_receiptdate: classify by order priority with the
# late-shipping predicate — the two-bucket conditional agg over a
# fact/dim join is the shape.)
_X33_SQL = """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS closed_count,
           CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS open_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

# --- x34: Q14 promotion effect --------------------------------------
_X34_SQL = """
    SELECT 100.00
           * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= DATE '1997-06-01'
      AND l_shipdate < DATE '1997-07-01'
"""

# --- x35: Q15 top supplier (CTE view) -------------------------------
_X35_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""

# --- x36: Q16 supplier-count by part attributes ---------------------
# (no partsupp: lineitem is the part-supplier link; "complaint"
# suppliers stand-in = negative account balance. NOT IN → anti-join.)
_X36_SQL = """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# --- x37: Q17 small-quantity-order revenue --------------------------
# Correlated scalar AVG per part → Catalyst rewrites to an aggregate
# + join; quantity sums/avgs are exact small ints in double.
_X37_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
"""

# --- x38: Q18 large-volume customers --------------------------------
_X38_SQL = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(l_quantity) > 210)
      AND c_custkey = o_custkey
      AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""

# --- x39: Q19 discounted revenue (OR of conjunct brackets) ----------
# (no p_container/l_shipmode: brand+size+quantity brackets keep the
# disjunctive pushdown shape — each OR arm prunes on the join.)
_X39_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 20 AND 30))
"""

# --- x112: Q2 minimum-cost supplier ---------------------------------
# (no partsupp/ps_supplycost: the part-supplier relation is derived
# from lineitem, supply cost = the MIN unit price that supplier ever
# charged for the part — exact MIN over identical IEEE doubles in
# both engines. The correlated scalar-MIN subquery over the
# region-filtered supplier set is the query's signature shape;
# Catalyst plans it as a per-part aggregate + join, the region/size/
# type filters broadcast-prune before the fact scan.)
_X112_SQL = """
    WITH supply AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(l_extendedprice / l_quantity) AS supply_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
           p_partkey, p_brand,
           CAST(supply_cost AS DOUBLE) AS supply_cost
    FROM part, supplier, supply, nation, region
    WHERE p_partkey = partkey
      AND s_suppkey = suppkey
      AND p_size IN (5, 15, 25, 35, 45)
      AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND supply_cost = (
          SELECT MIN(s2.supply_cost)
          FROM supply s2, supplier sp2, nation n2, region r2
          WHERE s2.partkey = p_partkey
            AND s2.suppkey = sp2.s_suppkey
            AND sp2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""

# --- x113: Q11 important stock identification ------------------------
# (no partsupp/ps_availqty: part value = the region's suppliers'
# discounted revenue on the part; the global-total scalar subquery
# against the same CTE is the shape. TPC-H's single nation and 1/SF
# fraction become a region filter and a scale-free 1.5x-mean
# threshold so the result is non-trivial at every SF (a lone nation
# has zero suppliers at sf0.001). All threshold arithmetic runs on the
# EXACT decimal sums — the double casts happen on already-exact
# values, so group membership can never flip with partial-agg
# order.)
_X113_SQL = """
    WITH partvalue AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS value_dec
        FROM lineitem, supplier, nation, region
        WHERE l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
        GROUP BY l_partkey
    )
    SELECT partkey AS p_partkey,
           CAST(value_dec AS DOUBLE) AS part_value
    FROM partvalue
    WHERE CAST(value_dec AS DOUBLE) >
          (SELECT CAST(1.5 AS DOUBLE)
                  * CAST(SUM(value_dec) AS DOUBLE) / COUNT(*)
           FROM partvalue)
    ORDER BY part_value DESC, p_partkey
"""

# --- x40: Q20 suppliers with excess shipments -----------------------
# (no partsupp/ps_availqty: a supplier qualifies when it shipped more
# than 100 units of some part of the target type — the nested
# IN-subquery chain → two semi-joins shape survives.)
_X40_SQL = """
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_type = 'LARGE')
              AND l_shipdate >= DATE '1997-01-01'
              AND l_shipdate < DATE '1998-01-01'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 100)
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_2', 'NATION_12', 'NATION_22')
    ORDER BY s_name
"""

_SQL = {
    "x25_tpch_q1": _X25_SQL,
    "x26_tpch_q3": _X26_SQL,
    "x27_tpch_q4": _X27_SQL,
    "x28_tpch_q6": _X28_SQL,
    "x29_tpch_q7": _X29_SQL,
    "x30_tpch_q8": _X30_SQL,
    "x31_tpch_q9": _X31_SQL,
    "x32_tpch_q10": _X32_SQL,
    "x33_tpch_q12": _X33_SQL,
    "x34_tpch_q14": _X34_SQL,
    "x35_tpch_q15": _X35_SQL,
    "x36_tpch_q16": _X36_SQL,
    "x37_tpch_q17": _X37_SQL,
    "x38_tpch_q18": _X38_SQL,
    "x39_tpch_q19": _X39_SQL,
    "x40_tpch_q20": _X40_SQL,
    "x112_tpch_q2": _X112_SQL,
    "x113_tpch_q11": _X113_SQL,
}


# Tables re-registered as a fan_out view per query, keyed by query
# name. ONLY the pure-aggregation shapes belong here: Q1's wide
# decimal aggregate is compute-bound on the under-split local scan
# (order-exact sums — DECIMAL money terms, integer-valued quantities
# — so the repartition cannot move a value), while the join-heavy
# queries REGRESS when the fact side is round-robined away from the
# layout AQE plans around (measured x38: 0.87 s → 1.90 s), so they
# keep the plain views. No-op at real scale (fan_out fires only on
# under-split scans). The SQL text — and therefore the oracle — is
# untouched.
_FAN_TABLES: dict[str, list[str]] = {
    "x25_tpch_q1": ["lineitem"],
}


def _verbatim(name: str, sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dislib_spark.tables import load_table, register_views
        from dislib_spark.utils.base import fan_out

        register_views(spark, sf_dir)
        for tbl in _FAN_TABLES.get(name, ()):
            fan_out(load_table(spark, sf_dir, tbl)).createOrReplaceTempView(
                tbl
            )
        return spark.sql(sql)

    return run


QUERIES = {name: _verbatim(name, sql) for name, sql in _SQL.items()}
ORACLE = dict(_SQL)
