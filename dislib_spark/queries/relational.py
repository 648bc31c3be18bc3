"""Declared relational queries Q1–Q17 (SURVEY.md §2.12).

Each query is written with the DataFrame API (declarative → Catalyst
optimizes: predicate pushdown, column pruning, join reordering, AQE).
Small dimensions are broadcast explicitly; everything else is left to
the optimizer.

``ORACLE`` holds the DuckDB-equivalent ANSI SQL for the driver's
correctness harness. Column aliases match exactly between the Spark
plan and the oracle SQL (the hash compare sorts columns by name).

The reference has no relational layer (SURVEY.md §2.3/§2.5: N/A in
reference → Spark built-in); these queries exercise the built-in
surface the new engine exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dislib_spark.tables import load_table


def _exact_sum(col: str):
    """Order-independent sum for 2-decimal money columns: cast to
    DECIMAL(18,2) (lossless for the testdata's money values), sum as
    decimal (exact, no float-ordering drift), cast back to double for
    display. Matches the oracle's
    ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`` bit-for-bit —
    float partial-sum ordering varies with partitioning, and
    ``ROUND(..., 6)`` cannot absorb ~1e-16 relative error on a ~1e9
    sum (the round-1 q06 hash failure)."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double")


def _exact_avg(col: str):
    """Deterministic average: exact decimal sum → double, divided by
    the count (single IEEE division — identical in Spark and DuckDB)."""
    return _exact_sum(col) / F.count(F.lit(1))


# --- Q1: scan + filter + project (pushdown-checked) ------------------
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- Q2: global aggregates (partial+final hash agg) ------------------
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        _exact_sum("l_extendedprice").alias("sum_extendedprice"),
        _exact_avg("l_discount").alias("avg_discount"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- Q3: grouped aggregation (KMeans-style partial+final) ------------
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            _exact_avg("l_extendedprice").alias("avg_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q4: exact median (reference array.py:1160-1182) -----------------
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty")
    )


# --- Q5: global sort + limit (TeraSort semantics, §2.6) --------------
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(F.desc("l_quantity"), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# --- Q6: equi join + agg ----------------------------------------------
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No broadcast hint: customer grows with SF (billions of rows at
    # 100 TB). AQE promotes the build side to broadcast when it is
    # actually small; a forced hint would be a hard scale ceiling.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_orderkey").alias("orders"),
            _exact_sum("o_totalprice").alias("sum_totalprice"),
        )
        .orderBy("c_mktsegment")
    )


# --- Q7: multi-way star join (both dims broadcast) -------------------
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("r_name", "n_name")
    )


# --- Q8: anti join (NOT IN ≡ left_anti on non-null key) --------------
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- Q9: UNION ALL (= reference concat_rows, array.py:2128) ----------
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_acctbal").alias("v"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_acctbal").alias("v"))
    return c.unionAll(s).where(F.col("v") > 0).agg(F.count(F.lit(1)).alias("n"))


# --- Q10: window top-1 per group (§2.5/§2.6 top-k merge) -------------
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
    )


# --- Q11: scalar math (reference exp/log/sqrt, array.py:1880-1950) ---
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    expr = (
        F.sqrt("l_quantity")
        + F.log(F.lit(1) + F.col("l_extendedprice"))
        + F.exp("l_discount")
        + F.pow("l_tax", F.lit(2))
    )
    return (
        li.where(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", F.round(expr, 6).alias("v"))
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- Q12: date functions ---------------------------------------------
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("m")
    )


# --- Q13: string functions over documents ----------------------------
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.min(F.length("text")).cast("long").alias("min_len"),
        )
        .orderBy("lang")
    )


# --- Q14: array dot products (SQL form of the matmul kernel) ---------
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 10)
    a = e.select(
        F.col("vec_id").alias("a_vec_id"),
        F.posexplode("embedding").alias("k", "av"),
    ).withColumn("av", F.col("av").cast("double"))
    b = e.select(
        F.col("vec_id").alias("b_vec_id"),
        F.posexplode("embedding").alias("k", "bv"),
    ).withColumn("bv", F.col("bv").cast("double"))
    return (
        a.join(b, "k")
        .groupBy("a_vec_id", "b_vec_id")
        .agg(F.round(F.sum(F.col("av") * F.col("bv")), 6).alias("dot"))
        .orderBy("a_vec_id", "b_vec_id")
    )


# --- Q15: event-time tumbling window (batch form of §2.10) -----------
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _exact_sum("value").alias("sum_value"),
        )
        .orderBy("w", "event_type")
    )


# --- Q16: exact distinct count ---------------------------------------
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.countDistinct("user_id").alias("n_users"))


# --- Q17: OLS slope/intercept (LinearRegression normal equations,
#          reference regression/linear/base.py:329-337) ---------------
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("slope"),
        F.round(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 6
        ).alias("intercept"),
    )


def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per market segment, the
    5 alphabetically-first customer names concatenated — the report-
    formatting staple SQL surface. collect_list is UNordered in a
    distributed engine, so determinism comes from sort_array BEFORE
    the slice; buffer bound = the grouped name set (document the
    slice-early caveat for wide groups at scale: a bounded top-k
    collect via orderBy-limit per group is the 100 TB swap-in)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.concat_ws(
                ",",
                F.slice(F.sort_array(F.collect_list("c_name")), 1, 5),
            ).alias("first5"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES = {
    "q01_filter_project": q1,
    "q02_global_agg": q2,
    "q03_group_agg": q3,
    "q04_median": q4,
    "q05_sort_limit": q5,
    "q06_join_agg": q6,
    "q07_star_join": q7,
    "q08_anti_join": q8,
    "q09_union_all": q9,
    "q10_window_topk": q10,
    "q11_scalar_math": q11,
    "q12_date_trunc": q12,
    "q13_string_funcs": q13,
    "q14_array_dot": q14,
    "q15_tumbling_window": q15,
    "q16_count_distinct": q16,
    "q17_regression_agg": q17,
    "q18_string_agg": q18,
}

ORACLE = {
    "q01_filter_project": """
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_quantity > 30 AND l_discount < 0.05
        ORDER BY l_orderkey, l_linenumber
    """,
    "q02_global_agg": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_extendedprice,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_discount,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty,
               COUNT(*) AS n
        FROM lineitem
    """,
    "q03_group_agg": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(SUM(l_quantity), 6) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_price
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q04_median": """
        SELECT ROUND(MEDIAN(l_quantity), 6) AS median_qty FROM lineitem
    """,
    "q05_sort_limit": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    "q06_join_agg": """
        SELECT c.c_mktsegment,
               COUNT(DISTINCT o.o_orderkey) AS orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_totalprice
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "q07_star_join": """
        SELECT r_name, n_name, COUNT(*) AS n
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    "q08_anti_join": """
        SELECT COUNT(*) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "q09_union_all": """
        SELECT COUNT(*) AS n FROM (
            SELECT c_acctbal AS v FROM customer
            UNION ALL
            SELECT s_acctbal FROM supplier
        ) t WHERE v > 0
    """,
    "q10_window_topk": """
        SELECT o_custkey, o_orderkey FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) t WHERE rn = 1 ORDER BY o_custkey
    """,
    "q11_scalar_math": """
        SELECT l_orderkey, l_linenumber,
               ROUND(SQRT(l_quantity) + LN(1 + l_extendedprice)
                     + EXP(l_discount) + POW(l_tax, 2), 6) AS v
        FROM lineitem WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber
    """,
    "q12_date_trunc": """
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS m,
               COUNT(*) AS n
        FROM orders GROUP BY m ORDER BY m
    """,
    "q13_string_funcs": """
        SELECT lang, COUNT(*) AS n,
               ROUND(AVG(n_chars), 6) AS avg_chars,
               MIN(LENGTH(text)) AS min_len
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "q14_array_dot": """
        SELECT a.vec_id AS a_vec_id, b.vec_id AS b_vec_id,
               ROUND(SUM(a.av * b.bv), 6) AS dot
        FROM (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS av,
                     GENERATE_SUBSCRIPTS(embedding, 1) AS k
              FROM embeddings WHERE vec_id < 10) a
        JOIN (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS bv,
                     GENERATE_SUBSCRIPTS(embedding, 1) AS k
              FROM embeddings WHERE vec_id < 10) b
          ON a.k = b.k
        GROUP BY a.vec_id, b.vec_id
        ORDER BY a_vec_id, b_vec_id
    """,
    "q15_tumbling_window": """
        SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY w, event_type ORDER BY w, event_type
    """,
    "q16_count_distinct": """
        SELECT COUNT(DISTINCT user_id) AS n_users FROM events
    """,
    "q17_regression_agg": """
        SELECT ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS intercept
        FROM lineitem
    """,
}

ORACLE["q18_string_agg"] = """
    SELECT c_mktsegment,
           COUNT(*) AS n,
           array_to_string(list_sort(list(c_name))[1:5], ',') AS first5
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""
