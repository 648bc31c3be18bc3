"""Extended relational surface queries (x*) and streaming-module
batch-form queries (s*), all DuckDB-oracle-checked.

The x-queries exercise Spark-built-in categories the reference lacks
(SURVEY.md §2 rows marked "N/A in reference → Spark built-in"):
grouping sets, set operations, JSON functions, correlated subqueries,
per-group percentiles, conditional aggregation/pivot, range joins.

The s-queries run the REAL ``dislib_spark.streaming`` transformations
in batch mode — batch/stream share one code path, so the oracle
certifies the streaming logic (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dislib_spark.streaming import await_drain
from dislib_spark.streaming.windows import (
    dedup_within_watermark,
    session_windows,
    sliding_avg,
    tumbling_counts,
)
from dislib_spark.tables import load_table
from dislib_spark.temporal import asof_join, interval_join


# --- x1: ROLLUP grouping sets ----------------------------------------
def x01_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- x2: INTERSECT / EXCEPT ------------------------------------------
def x02_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    both = c.intersect(s).agg(F.count(F.lit(1)).alias("n_both"))
    only_c = c.distinct().exceptAll(s.distinct()).agg(
        F.count(F.lit(1)).alias("n_only_customer")
    )
    return both.crossJoin(only_c)


# --- x3: JSON extraction over events.props ---------------------------
def x03_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
        .orderBy("k_mod")
    )


# --- x4: correlated EXISTS subquery ----------------------------------
def x04_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


# --- x5: per-group exact percentiles ---------------------------------
def x05_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # array-form percentile: ONE sort/buffer per group for both
    # quantiles (the m17 fix — two scalar percentile aggs each
    # buffered the whole group)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.9))"
            ).alias("_p")
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("_p", 1), 6).alias("p50"),
            F.round(F.element_at("_p", 2), 6).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


# --- x6: conditional aggregation (manual pivot) ----------------------
def x06_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    def status_sum(s: str):
        # Decimal sum: exact regardless of partial-sum ordering (the
        # money values are 2-decimal doubles, so the cast is lossless).
        return F.sum(
            F.when(F.col("o_orderstatus") == s, F.col("o_totalprice"))
            .otherwise(0.0)
            .cast("decimal(18,2)")
        ).cast("double")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            status_sum("F").alias("sum_f"),
            status_sum("O").alias("sum_o"),
            status_sum("P").alias("sum_p"),
        )
        .orderBy("o_orderpriority")
    )


# --- x7: range (non-equi) join ---------------------------------------
def x07_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    # bucket boundaries as a tiny broadcast dim; non-equi condition
    buckets = spark.createDataFrame(
        [(0, 0.0, 500.0), (1, 500.0, 1000.0), (2, 1000.0, 1500.0), (3, 1500.0, 1e9)],
        "bucket int, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(buckets),
            (p.p_retailprice >= buckets.lo) & (p.p_retailprice < buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
        )
        .orderBy("bucket")
    )


# --- x8: string functions --------------------------------------------
def x08_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.upper(F.substring("c_name", 1, 8)).alias("prefix"),
            F.length("c_name").alias("name_len"),
            F.col("c_name").like("%1%").alias("has_one"),
        )
        .groupBy("has_one")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("prefix").alias("min_prefix"),
            F.round(F.avg("name_len"), 6).alias("avg_len"),
        )
        .orderBy("has_one")
    )


# --- x9: date arithmetic ----------------------------------------------
def x09_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .groupBy("y", "q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("dow").alias("n_dow"),
        )
        .orderBy("y", "q")
    )


# --- x10: array functions over embeddings ----------------------------
def x10_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    emb = F.col("embedding").cast("array<double>")
    return (
        e.select(
            "vec_id",
            F.round(F.array_max(emb), 6).alias("vmax"),
            F.round(F.array_min(emb), 6).alias("vmin"),
            F.size(F.filter(emb, lambda v: v > 0)).alias("n_pos"),
            F.round(
                F.aggregate(emb, F.lit(0.0), lambda a, v: a + v), 6
            ).alias("vsum"),
        )
        .orderBy("vec_id")
    )


# --- x11: native pivot (groupBy().pivot()) ----------------------------
def x11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"n_{c.lower()}") for c in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


# --- x12: correlated scalar subquery (orders above 1.5× their
#          customer's average — decimal-exact averages both sides) -----
def x12_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cavg = o.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cavg")
    )
    return (
        o.join(cavg, "o_custkey")
        .where(F.col("o_totalprice") > F.col("cavg") * 1.5)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_big"),
        )
    )


# --- x13: backward as-of join (click → latest prior view) ------------
def x13_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join via ``temporal.asof_join`` — union + one
    window pass per user, NOT a range join (scale-safe)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    j = asof_join(
        clicks,
        views,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return j.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("asof_event_id").alias("view_id"),
        F.col("asof_value").alias("view_value"),
        # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike;
        # cast-to-long does not (a vanilla session reads events.ts as
        # TIMESTAMP_NTZ, which cannot cast to bigint). Truncate each
        # side to the second first: the oracle's date_diff counts
        # second-boundary crossings, not whole elapsed seconds.
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', asof_ts),"
            " date_trunc('second', ts))"
        ).alias("gap_s"),
    ).orderBy("click_id")


# --- s1: streaming tumbling window (module code path, batch form) ----
def s01_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return tumbling_counts(ev).orderBy("w_start", "event_type")


# --- s2: streaming session windows (module code path, batch form) ----
def s02_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = session_windows(ev, gap="30 minutes")
    return (
        out.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 6).alias("avg_events"),
            F.max("n_events").alias("max_events"),
        )
    )


# --- s4: streaming sliding window (module code path, batch form) -----
def s04_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sliding_avg(ev, window="1 hour", slide="15 minutes").orderBy(
        "w_start", "event_type"
    )


# --- s6: stream-static enrichment join (module code path) ------------
def s06_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched against the static customer dimension
    (broadcast per micro-batch — no stream state), rolled up per
    (hour, market segment). Same code path streams with availableNow
    (tests/test_io_streaming_multimodal.py); this batch form is the
    oracle-certified one."""
    from dislib_spark.streaming.windows import stream_static_enrich

    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return stream_static_enrich(ev, dim, on="user_id").orderBy(
        "w_start", "segment"
    )


# --- s5: stream-stream interval join (module code path, batch form) --
def s05_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 30 min after each click, via
    ``temporal.interval_join`` (the stream-stream join path)."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    j = interval_join(
        c,
        p,
        on="user_id",
        left_time="ts",
        right_time="p_ts",
        lower="0 seconds",
        upper="30 minutes",
        how="left",
    )
    return (
        j.groupBy("click_id")
        .agg(
            F.count(F.col("p_ts")).alias("n_purch"),
            F.coalesce(
                F.sum(F.col("p_value").cast("decimal(18,2)")).cast("double"),
                F.lit(0.0),
            ).alias("sum_purch"),
        )
        .orderBy("click_id")
    )


# --- x14: mergeable HLL distinct sketches ----------------------------
def x14_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct users per event_type via DataSketches HLL —
    AND the incremental contract: per-type partial sketches unioned
    back together must reproduce the global single-pass estimate
    (``merged_total`` column, constant across rows). DataSketches
    binaries aren't ANSI-replayable → rows-only check; the exactness
    property is pytest-gated (tests/test_sketches.py)."""
    from dislib_spark.sketches import (
        hll_distinct,
        hll_merge_estimate,
        hll_partial,
    )

    ev = load_table(spark, sf_dir, "events")
    per_type = hll_distinct(ev, "user_id", ["event_type"])
    merged = hll_merge_estimate(
        hll_partial(ev, "user_id", ["event_type"])
    ).withColumnRenamed("approx_distinct", "merged_total")
    return per_type.crossJoin(F.broadcast(merged)).orderBy("event_type")


# --- x15: ordered funnel (view → click → purchase) -------------------
def x15_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged min-timestamp funnel: users whose first view precedes a
    click precedes a purchase. Each stage is one keyed aggregation —
    the event table is scanned per stage but never self-joined
    row×row; stage outputs are user-cardinality (≪ events, but still
    SF-proportional, so they shuffle-join back — AQE may broadcast
    them when small, we never force it)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_view"),
            F.count("c_ts").alias("n_click"),
            F.count("p_ts").alias("n_purchase"),
        )
    )


# --- x16: weekly cohort retention ------------------------------------
def x16_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-cohort retention: users grouped by the week of their
    first event; one row per (cohort week, week offset) with active
    user counts. First-event table is user-cardinality (SF-growing) →
    plain shuffle join; AQE broadcasts it only when actually small."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_w",
            (F.datediff(F.col("aw"), F.col("cohort_w")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_w", "week_offset")
    )


# --- x17: bloom-prefiltered semi join --------------------------------
def x17_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems of high-value orders via the bloom semi-join
    prefilter (dislib_spark.sketches.bloom_semi_join): probe-side
    rows that cannot match are dropped before the join shuffle;
    the exact semi join removes false positives, so the result is
    identical to a plain semi join (the oracle)."""
    from dislib_spark.sketches import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    hi = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    )
    kept = bloom_semi_join(li, hi, "l_orderkey", "o_orderkey")
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# --- x18: verbatim-SQL interface (TPC-H Q5 shape) --------------------
_X18_SQL = """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
    GROUP BY n_name ORDER BY n_name
"""


def x18_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's raw-SQL entry point: every table registered as a
    temp view (``tables.register_views``), then ONE SQL string — the
    TPC-H Q5 local-supplier-revenue shape — run verbatim through
    ``spark.sql``; the oracle executes the SAME string on DuckDB.
    The per-row revenue term is cast to DECIMAL(18,4) before SUM:
    price(2dp) x discount-factor(2dp) is exactly 4dp rational, so the
    cast recovers it exactly and the sum is order-independent.
    Catalyst picks the join order; the dimension side broadcasts."""
    from dislib_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_X18_SQL)


# --- x21-x23: classic TPC-H shapes run verbatim on both engines ------
# (adapted to the synthetic schema: no comment/phone/receiptdate
# columns, so the filters use the columns that exist — the OPERATOR
# shapes are the point: Q13's filtered outer-join histogram, Q21's
# EXISTS+NOT-EXISTS self-joins, Q22's scalar-subquery + anti-join.)
_X21_SQL = """
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""

_X22_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""

_X23_SQL = """
    SELECT cc, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
    FROM (
        SELECT c_nationkey % 5 AS cc, c_acctbal, c_custkey FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    ) GROUP BY cc ORDER BY cc
"""


def _verbatim(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dislib_spark.tables import register_views

        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


x21_tpch_q13 = _verbatim(_X21_SQL)
x21_tpch_q13.__doc__ = (
    "TPC-H Q13 shape: filtered LEFT OUTER JOIN preserving zero-order "
    "customers, then an order-count histogram. Exercises outer-join "
    "null counting that no other declared query hits."
)
x22_tpch_q21 = _verbatim(_X22_SQL)
x22_tpch_q21.__doc__ = (
    "TPC-H Q21 shape: correlated EXISTS (another supplier in the "
    "order) + NOT EXISTS (nobody shipped later) self-joins on the "
    "fact table — Catalyst turns them into semi/anti hash joins."
)
x23_tpch_q22 = _verbatim(_X23_SQL)
x23_tpch_q22.__doc__ = (
    "TPC-H Q22 shape: uncorrelated scalar subquery (avg positive "
    "balance, 1-row broadcast) + anti-join on urgent orders, decimal "
    "money sum for order-independence."
)



# --- x41: fixed-width histogram --------------------------------------
def x41_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of order totals (bucket width
    50k, ~10 buckets over this data's price range):
    floor-division bucketing keeps the whole thing one
    map-side-combined aggregation — the profiling primitive every
    pipeline dashboard runs on a 100 TB fact table. Decimal sum per
    bucket for order-independence."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0)
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


# --- x44: sketch accuracy contract -----------------------------------
def x44_sketch_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact accuracy CONTRACT, oracle-visible: per event
    type, the exact distinct-user count plus boolean flags asserting
    (a) the HLL estimate lands within 2% of exact and (b) the
    KLL-style approx median lands between the exact 45th and 55th
    percentiles. The oracle pins the exact values and TRUE flags —
    if a sketch drifts out of tolerance the flag flips and the
    driver's value hash goes red. This makes the sketches' accuracy
    budget part of the graded correctness surface instead of a
    pytest-only property (the sketch BINARIES stay rows-only in x14,
    which checks the mergeability contract)."""
    from dislib_spark.sketches import approx_quantiles, hll_distinct

    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.expr("percentile(value, array(0.45, 0.55))").alias("_pq"),
    ).select(
        "event_type",
        "exact_users",
        F.element_at("_pq", 1).alias("_p45"),
        F.element_at("_pq", 2).alias("_p55"),
    )
    hll = hll_distinct(ev, "user_id", ["event_type"]).withColumnRenamed(
        "approx_distinct", "_hll"
    )
    med = approx_quantiles(
        ev, "value", [0.5], group_cols=["event_type"]
    ).select("event_type", F.col("quantiles")[0].alias("_amed"))
    return (
        exact.join(hll, "event_type")
        .join(med, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_hll") - F.col("exact_users"))
                <= 0.02 * F.col("exact_users")
            ).alias("hll_ok"),
            (
                (F.col("_amed") >= F.col("_p45"))
                & (F.col("_amed") <= F.col("_p55"))
            ).alias("median_ok"),
        )
        .orderBy("event_type")
    )


# --- x43: CDC latest-per-key compaction ------------------------------
def x43_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture compaction: the latest event per user
    (row_number over a per-key timestamp sort) — the upsert/merge
    primitive every incremental pipeline runs. One exchange on the
    key; ties broken by event_id so the survivor is deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


# --- x42: co-purchase pair mining ------------------------------------
def x42_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order at least 3 times, support-ranked — the candidate-pair step
    of frequent-itemset mining (``functions.basket.copurchase_pairs``).
    ONE shuffle (groupBy order), pairs exploded from each basket's
    sorted item array — no self-join. Fan-out is Σ basket²; at 100 TB
    the giant-basket skew lever is ``max_basket`` (deterministic
    smallest-item-ids truncation, same shape as the dedup bucket
    caps) — off here because TPC-H baskets are ≤7 lines and the
    oracle replays exact pairs; the bounded-fan-out property is
    pytest-pinned (tests/test_stats_ops.py)."""
    from dislib_spark.functions.basket import copurchase_pairs

    li = load_table(spark, sf_dir, "lineitem")
    return copurchase_pairs(
        li, "l_orderkey", "l_partkey", min_support=3
    ).orderBy(F.desc("n"), "p1", "p2")


# --- x24: moving-average window frame --------------------------------
def x24_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS-frame window (3-order trailing moving average of
    order value per customer) — the frame variant x20's cumulative
    window doesn't cover. Deterministic ordering: date then orderkey;
    output bounded to custkey < 50."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.avg("o_totalprice").over(w), 6).alias("mavg3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --- x19: NTILE quantile bucketing -----------------------------------
def x19_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile customers by account balance (fully deterministic
    ordering: acctbal then custkey) — per-bucket count and bounds.

    NO global Window: ``ntile(k) OVER (ORDER BY ...)`` funnels the
    whole table through one partition. Instead the global rank comes
    from ``with_global_index`` (range-partitioned sort + per-partition
    offsets — TeraSort-shaped, every partition stays ~n/P) and the
    NTILE bucket is computed arithmetically from (rank, n): the first
    ``n % k`` buckets hold ``n//k + 1`` rows, the rest ``n//k`` —
    exactly SQL NTILE's row-position semantics. ``n`` arrives via a
    1-row broadcast (no driver action)."""
    from dislib_spark.utils.base import with_global_index

    c = load_table(spark, sf_dir, "customer").select(
        "c_acctbal", "c_custkey"
    )
    ranked = with_global_index(c, ["c_acctbal", "c_custkey"], "_r")
    tot = F.broadcast(c.agg(F.count(F.lit(1)).alias("_n")))
    # integer DIV keeps the bucket math exact at any n (no double
    # rounding); first n%4 buckets get n DIV 4 + 1 rows, rest n DIV 4
    q = F.expr(
        "CAST(CASE WHEN _r < (_n % 4) * (_n DIV 4 + 1) "
        "THEN _r DIV (_n DIV 4 + 1) + 1 "
        "ELSE (_n % 4) + (_r - (_n % 4) * (_n DIV 4 + 1)) DIV (_n DIV 4) + 1 "
        "END AS INT)"
    ).alias("q")
    return (
        ranked.crossJoin(tot)
        .select(q, "c_acctbal")
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 6).alias("lo"),
            F.round(F.max("c_acctbal"), 6).alias("hi"),
        )
        .orderBy("q")
    )


# --- x20: running totals (cumulative window sum) ---------------------
def x20_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative order spend in date order (ties broken
    by orderkey); returns the top-25 customers' final rows."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 25)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("run_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --- x45: hypertable multi-resolution time rollup --------------------
def x45_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate / hypertable rollup: hour-grain partial
    aggregates re-aggregated to day grain. At 100 TB the hour table
    IS the materialized view — coarser grains (day/week/month) derive
    from its mergeable partials (counts + decimal sums), so the raw
    event stream is scanned once and every resolution after the first
    is dimension-sized work. Decimal sums make the two-level total
    bit-equal to the oracle's one-level GROUP BY."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", "h").alias("day"), "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
        .select(
            "day",
            "event_type",
            "n",
            "sum_value",
            F.round(F.col("sum_value") / F.col("n"), 6).alias("avg_value"),
        )
        .orderBy("day", "event_type")
    )


# --- x46: time-series gap-fill with LOCF ------------------------------
def x46_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series per event type: a generated day spine
    (sequence of the corpus' min..max day × distinct types — both
    dimension-sized, broadcast) left-joined against the daily
    aggregate, missing days filled by last-observation-carried-forward
    (``last(ignorenulls)`` over an unbounded-preceding frame). The
    hypertable `time_bucket_gapfill + locf` shape; the only
    corpus-sized work is the one daily aggregation."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
    days = (
        ev.agg(
            F.date_trunc("day", F.min("ts")).alias("lo"),
            F.date_trunc("day", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    types = ev.select("event_type").distinct()
    spine = days.crossJoin(types)
    joined = spine.join(daily, ["day", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "day",
        "event_type",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        F.round(
            F.coalesce(
                F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)
            ),
            6,
        ).alias("filled_value"),
    ).orderBy("day", "event_type")


# --- x47: incremental rollup maintenance (base ⊎ delta merge) ---------
def x47_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a (day, type) rollup
    kept up to date by MERGING yesterday's partials with a new-data
    delta, never re-scanning history. Base = events before day 16,
    delta = the rest; each side aggregates independently (at 100 TB
    the base partials are a stored table — only the delta touches raw
    data), then a UNION ALL + re-aggregation merges the mergeable
    state (counts + decimal sums). The oracle is the full recompute,
    proving merge ≡ recompute."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.dayofmonth("ts") < 16

    def partial(side: DataFrame) -> DataFrame:
        return side.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )

    base = partial(ev.where(cut))
    delta = partial(ev.where(~cut))
    return (
        base.unionAll(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


# --- x48: shuffle-key skew diagnostic ---------------------------------
def x48_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of lineitem's join key (l_partkey): the one-pass
    diagnostic that decides plain shuffle vs AQE skew-split vs salted
    join before launching a big job at the 100 TB target. Runs the
    same map-side-combined key count the real aggregation would."""
    from dislib_spark.utils.skew import skew_profile

    li = load_table(spark, sf_dir, "lineitem")
    return skew_profile(li, ["l_partkey"], top=5)



# --- x49: z-order (Morton) layout locality profile --------------------
def x49_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout profile: interleave 8-bit cells of the two
    lineitem join keys into a Morton code and show that every
    256-code bucket confines BOTH dimensions to a ≤16-wide range —
    the property that lets parquet min-max stats prune scans on
    either key after `sources.zorder.cluster_by_zorder`. Pure integer
    bit arithmetic → exact on both engines."""
    from dislib_spark.sources.zorder import zorder_value

    li = load_table(spark, sf_dir, "lineitem")
    x = (F.col("l_partkey") % 256).alias("x")
    y = (F.col("l_suppkey") % 256).alias("y")
    cells = li.select(x, y)
    z = zorder_value([F.col("x"), F.col("y")], bits=8)
    return (
        cells.select("x", "y", F.shiftright(z, 8).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
        .orderBy("bucket")
    )



# --- s7: streaming rollup partials (module code path, batch form) -----
def s07_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming continuous-aggregate sink: the
    SAME `rollup_partials` the foreachBatch sink appends, split into
    per-half partial tables and merged by `read_rollup`'s
    aggregation shape — oracle = one-level day rollup, certifying
    the streaming module's merge-on-read math."""
    from dislib_spark.streaming.windows import rollup_partials

    ev = load_table(spark, sf_dir, "events")
    halves = [
        rollup_partials(ev.where(F.dayofmonth("ts") % 2 == i))
        for i in (0, 1)
    ]
    return (
        halves[0].unionAll(halves[1])
        .groupBy("bucket", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
        .orderBy("bucket", "event_type")
    )


# --- s3: streaming dedup (module code path, batch form) --------------
def s03_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # duplicate the stream then dedup by event_id: count must equal
    # the distinct-event count
    doubled = ev.unionAll(ev)
    out = dedup_within_watermark(doubled, keys=["event_id"])
    return out.agg(F.count(F.lit(1)).alias("n"))


def x50_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via the built-in ``DataFrame.unpivot``
    (melt): per-returnflag measure columns become (flag, measure,
    value) rows — the inverse of x11's pivot. Narrow 1→m row
    expansion AFTER the aggregation, so the unpivot input is
    group-count-sized, never corpus-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_rows"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("l_returnflag", "measure")


def x51_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert + delete arms) via ``sources.merge.
    merge_into``: matched orders get a new status/price, marker rows
    delete, unmatched updates insert — then a per-status summary of
    the merged table. ONE full-outer equi-join on the key; at 100 TB
    the copy-on-write rewrite is partition-scoped (module docstring)."""
    from dislib_spark.sources.merge import merge_into

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    upd = (
        o.where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 97 == 0).select(
                (-F.col("o_orderkey")).alias("o_orderkey"),
                F.lit("I").alias("o_orderstatus"),
                "o_totalprice",
            )
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 100 == 50).select(
                "o_orderkey",
                F.lit("D").alias("o_orderstatus"),
                "o_totalprice",
            )
        )
    )
    merged = merge_into(
        o, upd, ["o_orderkey"],
        delete_condition=F.col("o_orderstatus") == "D",
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


def x52_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets with GROUPING() disambiguation flags — the
    full 2^d grouping lattice beyond x01's rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


def x53_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of orders (null counts + exact
    NDV per column in ONE aggregate job) — the CBO-stats / data-
    quality snapshot pass; ``approx_count_distinct`` is the
    documented 100 TB swap-in (``utils.profile``)."""
    from dislib_spark.utils.profile import table_profile

    o = load_table(spark, sf_dir, "orders")
    return table_profile(
        o, ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    ).orderBy("col_name")


def x54_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping effectiveness audit: for two candidate
    file layouts of lineitem — insertion order (bucketed by
    ``floor(l_orderkey/64)``) vs shipdate-clustered (bucketed by
    month) — compute each bucket's (min, max) l_shipdate zone map and
    report how many buckets a 3-month date predicate can prune, plus
    the read amplification (rows scanned in surviving buckets ÷ rows
    actually matching). The quantified "should I OPTIMIZE/ZORDER this
    table" decision input behind x49's Morton layout; one grouped
    pass per layout, per-bucket state only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lo = F.lit("1996-03-01").cast("timestamp")
    hi = F.lit("1996-06-01").cast("timestamp")
    match = (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)

    def layout(bucket, name: str) -> DataFrame:
        per = li.groupBy(bucket.alias("b")).agg(
            F.min("l_shipdate").alias("mn"),
            F.max("l_shipdate").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.sum(match.cast("long")).alias("nm"),
        )
        pruned = (F.col("mx") < lo) | (F.col("mn") >= hi)
        return per.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(pruned.cast("long")).alias("n_pruned"),
            F.sum(F.when(~pruned, F.col("n")).otherwise(0)).alias(
                "rows_scanned"
            ),
            F.sum("nm").alias("rows_matched"),
        )

    out = layout(
        F.floor(F.col("l_orderkey") / 64), "orderkey_insertion"
    ).unionAll(layout(F.date_trunc("month", "l_shipdate"), "shipdate_month"))
    return out.select(
        "layout",
        "n_buckets",
        "n_pruned",
        "rows_scanned",
        "rows_matched",
        F.round(
            F.col("rows_scanned").cast("double")
            / F.col("rows_matched").cast("double"),
            4,
        ).alias("read_amplification"),
    ).orderBy("layout")


def x55_share_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI share-of-total report: revenue per nation, its share of the
    REGION subtotal and of the grand total, plus dense-rank within
    region — windows layered OVER the grouped aggregate (the window
    input is |nations| rows, never the fact table), with the two
    dimension joins broadcast onto one fact scan. Exact decimal
    revenue so shares are engine-stable."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    per_nation = (
        # customer is SF-proportional — no broadcast hint (AQE decides);
        # nation/region are genuinely fixed-size dims.
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    wr = Window.partitionBy("r_name")
    wall = Window.partitionBy()
    return per_nation.select(
        "r_name",
        "n_name",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        # cast the exact decimal sums to double BEFORE dividing: both
        # engines then do the same IEEE divide (decimal division has
        # engine-specific scale/rounding rules)
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(wr).cast("double"),
            6,
        ).alias("region_share"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(wall).cast("double"),
            6,
        ).alias("total_share"),
        F.dense_rank()
        .over(wr.orderBy(F.desc("rev"), "n_name"))
        .alias("rank_in_region"),
    ).orderBy("r_name", "rank_in_region", "n_name")


def s08_decayed_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed heavy hitters over events (trending-keys
    primitive): per-(user, hour) counts decayed by the dyadic-exact
    0.5^Δh rule (``streaming.decay.decayed_counts``). The batch form
    of the append-only streaming sink; stream ≡ batch is pytest-gated
    (tests/test_decayed_hitters.py)."""
    from dislib_spark.streaming.decay import decayed_counts

    ev = load_table(spark, sf_dir, "events")
    return decayed_counts(ev, "user_id", top_k=20)


def s09_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator run FOR REAL: per-user
    running (count, sum, max) through ``applyInPandasWithState``
    (``streaming.windows.running_user_stats``) on an availableNow
    file stream into a memory sink, then reduced to each user's FINAL
    state row. The final state equals the batch GROUP BY, so this
    arbitrary-stateful path gets a full DuckDB oracle — value-exact
    because events.value is 2-decimal money: every per-user sum is a
    multiple of 0.01, which sits 0.5e-6 - O(1e-9 accumulation error)
    away from any 6-dp rounding boundary, so ROUND(total, 6) is
    order-of-summation-proof on both engines. State is O(users)
    across the cluster; rows stream through in Arrow batches."""
    import tempfile
    import uuid

    from dislib_spark.streaming.windows import running_user_stats

    ev = load_table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="s09_src_")
    ev.write.mode("overwrite").parquet(src)
    sink = f"s09_sink_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        # a silent partial memory table would hash-diverge from the
        # oracle with no error pointing here — fail loudly instead
        q.stop()
        raise TimeoutError(
            "s09 availableNow stream did not finish within 300 s"
        )
    # update mode emits one row per (micro-batch, key); the final
    # state per user is the max-n row (n strictly grows per emit)
    final = (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.max(F.struct("n", "total", "vmax")).alias("s"))
    )
    return final.select(
        "user_id",
        F.col("s.n").alias("n"),
        F.round("s.total", 6).alias("total"),
        F.col("s.vmax").alias("vmax"),
    ).orderBy("user_id")


def x56_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day RANGE-frame window (time-based frame, the
    variant x24's 3-ROW frame can't express — gaps in the calendar
    must still bound the lookback by TIME): daily event counts per
    type, then a range frame over day numbers. The window runs over
    the |days × types| pre-aggregate, never raw events."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # day stays a TIMESTAMP: a DATE here serializes as date-vs-
    # midnight-timestamp across the two engines' pandas/driver forms
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    daily = daily.withColumn(
        "dayno", F.datediff(F.col("day").cast("date"), F.lit("1970-01-01"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dayno")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).alias("trailing7_n"),
        F.round(
            F.sum("n").over(w).cast("double") / F.count("n").over(w), 6
        ).alias("trailing7_daily_avg"),
    ).orderBy("event_type", "day")


def x57_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics portability: a nullable key (every k≡0 mod 3
    json value → NULL) grouped WITH its null group, then joined to a
    label dimension by NULL-SAFE equality (``eqNullSafe`` /
    ``IS NOT DISTINCT FROM``) so the null group keeps its 'missing'
    label instead of being dropped by equi-join semantics; ordered
    NULLS LAST explicitly. The three null behaviors (grouping,
    joining, ordering) every cross-engine port trips over, in one
    checked query."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    key = F.when(k % 3 == 0, F.lit(None).cast("long")).otherwise(k % 5)
    g = ev.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n")
    )
    dim = spark.createDataFrame(
        [(None, "missing"), (1, "one"), (2, "two"), (3, "three"), (4, "four")],
        "key long, label string",
    )
    return (
        g.join(F.broadcast(dim), g["key"].eqNullSafe(dim["key"]), "left")
        .select(
            g["key"].alias("key"),
            F.coalesce("label", F.lit("?")).alias("label"),
            "n",
        )
        .orderBy(F.col("key").asc_nulls_last())
    )


def x58_window_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection (the monitoring twin of
    x56): each day's event count per type is z-scored against the
    PRECEDING 7 days' mean/std (current day excluded — no
    self-contamination), then per-type anomaly counts roll up. All
    windows run over the |days × types| daily pre-aggregate; std
    comes from exact integer sum/sumsq window algebra."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    daily = daily.withColumn(
        "dayno", F.datediff("day", F.lit("1970-01-01"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("dayno")
        .rangeBetween(-7, -1)
    )
    x = F.col("n").cast("double")
    cnt = F.count("n").over(w).cast("double")
    s = F.sum("n").over(w).cast("double")
    q = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    mean = s / cnt
    var = (q - s * s / cnt) / (cnt - 1)
    z = (x - mean) / F.sqrt(var)
    scored = daily.select(
        "event_type",
        "day",
        "n",
        # need >= 2 trailing days and positive variance for a z-score
        F.when((cnt >= 2) & (var > 0), z).alias("z"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.count("z").alias("n_scored"),
            # when(...).otherwise(0), not a bare cast: an all-NULL z
            # group must report 0 like the oracle's ELSE 0, not NULL
            F.sum(
                F.when(F.abs(F.col("z")) > 2, 1).otherwise(0)
            ).alias("n_anomalies"),
            F.round(F.max(F.abs("z")), 4).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


_X59_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_linestatus), ())
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""


def x59_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the third grouping-lattice variant
    beyond x01's ROLLUP and x52's CUBE — an arbitrary subset list,
    here skipping the per-returnflag-only set) run verbatim through
    ``spark.sql``; the oracle executes the same string."""
    from dislib_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_X59_SQL)


def x60_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint verification report: primary-key
    uniqueness (orders), referential integrity orders→customer
    (orphan count via anti-join), value-range and null-rate checks —
    each check one row (check, metric, passed). Uniqueness and the
    range/null checks share ONE orders scan (conditional aggregate);
    the FK check is a broadcast anti-join. The audit every scheduled
    pipeline runs before publishing a table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("n_bad_price"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("n_null_cust"),
    )
    # customer is SF-proportional — plain shuffle anti-join (AQE will
    # still broadcast it when the scan is actually small).
    orphans = o.join(
        c, o["o_custkey"] == c["c_custkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_orphans"))
    w = base.crossJoin(F.broadcast(orphans))
    checks = [
        ("pk_unique_o_orderkey", F.col("n") - F.col("n_keys")),
        ("fk_orders_customer_orphans", F.col("n_orphans")),
        ("range_o_totalprice_positive", F.col("n_bad_price")),
        ("nonnull_o_custkey", F.col("n_null_cust")),
    ]
    out = w.select(
        F.col("n").alias("n_rows"),
        *[expr.cast("long").alias(name) for name, expr in checks],
    )
    stacked = out.select(
        "n_rows",
        F.expr(
            "stack(4,"
            " 'fk_orders_customer_orphans', fk_orders_customer_orphans,"
            " 'nonnull_o_custkey', nonnull_o_custkey,"
            " 'pk_unique_o_orderkey', pk_unique_o_orderkey,"
            " 'range_o_totalprice_positive', range_o_totalprice_positive)"
            " AS (check, n_violations)"
        ),
    )
    return stacked.select(
        "check",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check")


# --- x61: batch sessionization (gaps-and-islands) --------------------
def x61_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session detail rows from ``temporal.sessionize`` (30-min
    inactivity gap, event_id tiebreak): session start, event count,
    decimal-exact spend, duration seconds — the batch complement of
    s02's streaming session_window, keeping every event row so
    per-session detail stays queryable. Window is ALWAYS
    partitionBy(user) — no global sort at any scale."""
    from dislib_spark.temporal import _epoch_seconds, sessionize

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    sess = sessionize(
        ev, "user_id", "ts", gap="30 minutes", tiebreak="event_id"
    )
    sec = _epoch_seconds(sess, "ts")
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.date_trunc("second", F.min("ts")).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend"),
            (F.max(sec) - F.min(sec)).alias("duration_s"),
        )
        .orderBy("user_id", "session_id")
    )


# --- x62: recency-decayed scoring ------------------------------------
def x62_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed spend
    (``temporal.recency_weighted_sum``, 7-day half-life anchored at a
    pinned t_ref) — the recency weight a training-data sampler or
    feature store applies, expressed as one ORDER-INDEPENDENT
    aggregation (per-term decimal cast; no sequential EWMA recursion,
    so map-side partials work and batch ≡ incremental)."""
    from dislib_spark.temporal import recency_weighted_sum

    ev = load_table(spark, sf_dir, "events")
    out = recency_weighted_sum(
        ev,
        "user_id",
        "ts",
        "value",
        half_life=7 * 86400.0,
        t_ref_epoch=1706745600,  # 2024-02-01T00:00:00Z
    )
    return out.select(
        "user_id",
        F.round("decayed_sum", 6).alias("decayed_spend"),
        "n_events",
    ).orderBy("user_id")


# --- x63: time-weighted average (tick-database TWAP) -----------------
def x63_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) time-weighted average event value
    (``temporal.twap``): each observation weighted by the seconds it
    was current — the hypertable aggregate a naive AVG gets wrong
    whenever observations are irregularly spaced. One per-(user, day)
    window for the lead + one map-side-combined agg; integer weights
    and decimal sums make the replay exact."""
    from dislib_spark.temporal import twap

    ev = load_table(spark, sf_dir, "events")
    return twap(
        ev, "user_id", "ts", "value", bucket="day", tiebreak="event_id"
    ).orderBy("user_id", "bucket")


# --- x64: OHLC bars ---------------------------------------------------
def x64_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly open/high/low/close/volume bars per event type
    (``temporal.ohlc_bars``) — the canonical hypertable rollup.
    Open/close ride a lexicographic struct MIN/MAX on
    (second, event_id, value), so the whole bar is ONE
    map-side-combined aggregation: no window, no sort, one shuffle on
    the (type, hour) key at any scale."""
    from dislib_spark.temporal import ohlc_bars

    ev = load_table(spark, sf_dir, "events")
    return ohlc_bars(
        ev, "event_type", "ts", "value", bucket="hour",
        tiebreak="event_id",
    ).orderBy("event_type", "bucket")


# --- x65: SCD2 dimension build + point-in-time lookup ----------------
def x65_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 from an event stream: each
    user's event_type history becomes validity intervals
    ``[valid_from, valid_to)`` via one per-user lead window (the SCD2
    *build* every warehouse runs on CDC feeds — x43 is the SCD1
    compact, this keeps full history), then three pinned probe
    instants look up the active version per user — a
    broadcast-probes interval join, returning (probe_s, user_id,
    event_type, version, n_versions).

    Scale: the build is ONE per-user window (hash shuffle on user);
    the lookup broadcasts the tiny probe list against the interval
    table — never a corpus×corpus range join. Epoch-second interval
    bounds + event_id tiebreak make the replay exact."""
    from pyspark.sql import Window

    from dislib_spark.temporal import _epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    sec = _epoch_seconds(ev, "ts")
    w = Window.partitionBy("user_id").orderBy(sec.asc(), F.col("event_id"))
    dim = ev.select(
        "user_id",
        "event_type",
        sec.alias("valid_from"),
        F.coalesce(
            F.lead(sec).over(w), F.lit(2**62)
        ).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )
    probes = spark.range(3).select(
        (F.lit(1704844800) + F.col("id") * 864000).alias("probe_s")
    )  # 2024-01-10 / -20 / -30 00:00:00Z
    hits = dim.join(
        F.broadcast(probes),
        (F.col("valid_from") <= F.col("probe_s"))
        & (F.col("probe_s") < F.col("valid_to")),
    )
    counts = dim.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_versions")
    )
    return (
        hits.join(counts, "user_id")
        .select("probe_s", "user_id", "event_type", "version", "n_versions")
        .where(F.col("user_id") < 40)
        .orderBy("probe_s", "user_id")
    )


# --- x66: blocked entity resolution (record linkage) -----------------
def x66_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over customers (``linkage.entity_pairs``):
    candidates blocked on (nation, market segment) — an equi-join,
    never a corpus self-join — scored 0.6·name-levenshtein-sim +
    0.4·balance-proximity, top-30 matches. The Splink-style
    structured-record dedup that text dedup (t26) can't express:
    multi-field weighted evidence with cheap blocking. All similarity
    math is exact integer/2-dec arithmetic, so the replay is exact.

    ``max_block=40`` exercises the deterministic whale-block cap for
    real: levenshtein cost is Σ block², and TPC-H's (nation, segment)
    blocks grow with sf — the cap keeps pair count flat per block at
    any scale (inactive at sf≤0.01 where blocks are ≤12 wide; at
    sf0.1 it cut the uncapped 8.5 s / ~900k-pair run to ~1 s)."""
    from dislib_spark.linkage import (
        entity_pairs,
        numeric_similarity,
        string_similarity,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey", "c_mktsegment"
    )
    scores = {
        "name": string_similarity(F.col("a_c_name"), F.col("b_c_name")),
        "acctbal": numeric_similarity(
            F.col("a_c_acctbal"), F.col("b_c_acctbal"), scale=2000.0
        ),
    }
    out = entity_pairs(
        c,
        "c_custkey",
        ["c_nationkey", "c_mktsegment"],
        scores,
        weights={"name": 0.6, "acctbal": 0.4},
        threshold=0.5,
        max_block=40,
    )
    return out.orderBy(F.desc("score"), "a_id", "b_id").limit(30)


# --- x67: Markov transition matrix -----------------------------------
def x67_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition probabilities per user
    journey (``temporal.markov_transitions``): lead() in a
    partitionBy(user) window → one map-side-combined pair count →
    row-normalize over the |states|² table. The clickstream model
    that x15's funnel and x61's sessions read off — no global sort,
    no self-join, exact integer counts."""
    from dislib_spark.temporal import markov_transitions

    ev = load_table(spark, sf_dir, "events")
    return markov_transitions(
        ev, "user_id", "event_type", ["ts", "event_id"]
    ).orderBy("prev_state", "next_state")


# --- x68: month-over-month growth ------------------------------------
def x68_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period KPI report: monthly order revenue per
    region with month-over-month growth — lag() layered OVER the
    grouped aggregate (window input is |regions × months| rows,
    never the fact scan), dims broadcast, decimal-exact sums cast to
    double BEFORE the growth divide."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    monthly = (
        # customer is SF-proportional — no broadcast hint (AQE decides);
        # nation/region are genuinely fixed-size dims.
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            "r_name", F.date_trunc("month", "o_orderdate").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
    )
    w = Window.partitionBy("r_name").orderBy("month")
    prev = F.lag(F.col("rev")).over(w)
    return monthly.select(
        "r_name",
        "month",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            (F.col("rev").cast("double") - prev.cast("double"))
            / prev.cast("double"),
            6,
        ).alias("mom_growth"),
    ).orderBy("r_name", "month")


# --- x69: Gini revenue concentration ---------------------------------
def x69_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-revenue concentration per region: Gini coefficient
    via the rank formula G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over
    revenue-ranked customers — the Lorenz-curve summary behind
    "top-1% of customers" dashboards. With only 5 regions a
    ``Window.partitionBy(region)`` rank puts n/5 customers in each
    window partition, so the per-region rank is instead derived from
    ONE distributed global index over (region, rev, custkey) — ranks
    within a region are contiguous in that order, so
    ``i = _gidx − min(_gidx per region) + 1`` (a 5-row broadcast
    offset join) reproduces the per-region row_number with no
    near-global window; the rank·revenue cross-moment accumulates as
    exact DECIMAL(38,2) (a double sum overflows 2^53), cast to double
    only for the final scalar algebra."""
    from dislib_spark.utils.base import with_global_index

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    per_cust = (
        # customer is SF-proportional — no broadcast hint (AQE decides);
        # nation/region are genuinely fixed-size dims.
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    indexed = with_global_index(
        per_cust, order_by=["r_name", "rev", "c_custkey"], idx_col="_gidx"
    )
    base = indexed.groupBy(F.col("r_name").alias("_rn")).agg(
        F.min("_gidx").alias("_base")
    )
    ranked = indexed.join(
        F.broadcast(base), indexed.r_name == F.col("_rn")
    ).select(
        "r_name",
        "rev",
        (F.col("_gidx") - F.col("_base") + 1).cast("decimal(20,0)").alias("i"),
    )
    s1 = F.sum((F.col("i") * F.col("rev")).cast("decimal(38,2)"))
    return (
        ranked.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("rev").alias("tot"),
            s1.alias("s1"),
        )
        .select(
            "r_name",
            "n_cust",
            F.col("tot").cast("double").alias("revenue"),
            F.round(
                F.lit(2.0)
                * F.col("s1").cast("double")
                / (F.col("n_cust") * F.col("tot").cast("double"))
                - (F.col("n_cust") + 1) / F.col("n_cust").cast("double"),
                6,
            ).alias("gini"),
        )
        .orderBy("r_name")
    )


# --- x70: revenue autocorrelation -------------------------------------
def x70_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality diagnostic: autocorrelation of monthly order
    revenue at lags 1-12 (``temporal.acf``). The fact scan collapses
    to one row per month FIRST; every window/join in the ACF runs
    over that |months|-row rollup (bounded by the calendar span at
    any corpus size). Deviations are 4-dp DECIMAL so both Σ are
    order-exact — the only float ops are the final divisions."""
    from dislib_spark.temporal import acf

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    return acf(monthly, "m", "rev", 12)


# --- x71: CUSUM level-shift screen ------------------------------------
def x71_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint / level-shift screen on daily event value
    (``temporal.cusum``): S_t = Σ_{i≤t}(x_i − μ) over the daily
    rollup — a drifting mean makes |S_t| ramp; its argmax locates the
    change. The fact scan collapses to |days| rows first; S_t comes
    from an EXACT decimal prefix sum minus t·μ (one IEEE product per
    row), so there is no float accumulation anywhere."""
    from dislib_spark.temporal import cusum

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    return cusum(daily, "day", "v")


# --- x72: RSI momentum telemetry --------------------------------------
def x72_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-period RSI (Cutler SMA form) on daily event value
    (``temporal.rsi``) — the momentum/overbought telemetry next to
    x63's TWAP and x64's OHLC bars. Deltas and both trailing
    gain/loss sums stay EXACT decimals over the |days|-row rollup;
    the one float op is the final ratio, and all-gain windows pin
    RSI to exactly 100."""
    from dislib_spark.temporal import rsi

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    return rsi(daily, "day", "v", period=7)


# --- x73: duplicate-billing screen ------------------------------------
def x74_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram sketch -> quantile estimates
    (p50/p90/p99 of l_extendedprice per returnflag) via
    ``sketches.histogram_sketch`` + ``quantiles_from_histogram``:
    fixed global (lo, hi) bounds make per-corpus partial histograms
    directly addable (union + re-sum — the storable/streamable
    summary; mergeability pinned in tests/test_sketches.py), and the
    within-bin linear interpolation is integer-count arithmetic, so
    unlike rank-error sketches the estimate is bit-deterministic and
    fully DuckDB-replayed. Window input is <= 128 rows per group by
    construction at ANY corpus size. The (lo, hi) bounds are a
    broadcast 1-row frame, so the query is ONE lazy composable job —
    no driver action inside the function."""
    from dislib_spark.sketches import histogram_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantiles(
        li, "l_extendedprice", n_bins=128, qs=(0.5, 0.9, 0.99),
        by="l_returnflag",
    ).orderBy("l_returnflag", "q")


def x75_funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed last-touch attribution (``temporal
    .funnel_attribution``): each purchase credits the latest click by
    the same user within the preceding hour; daily rollup of
    (purchases, attributed, mean lag). Candidates come from the
    (user, hour-bucket) equi-join with the click side exploded to
    {b, b+1} — the adjacent-bucket pattern, never a per-user cross
    product — and the per-purchase argmax is one map-side MAX."""
    from dislib_spark.temporal import funnel_attribution

    ev = load_table(spark, sf_dir, "events")
    per = funnel_attribution(
        ev, "user_id", "ts", "event_type", "click", "purchase",
        window_s=3600,
    )
    return (
        per.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("from_sec").isNotNull().cast("long")).alias(
                "n_attributed"
            ),
            F.round(F.avg("lag_s"), 6).alias("avg_lag_s"),
        )
        .orderBy("day")
    )


def x73_dup_billing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate transaction screen: same customer, totalprice in
    the same 10k bucket, within 30 days — the classic double-billing /
    replayed-ETL audit. ONE window pass partitioned by (customer,
    bucket) ordered by (date, key): each row checks only its
    predecessor, so the output is linear (never the O(k²) self-join)
    and the partition key is too fine to skew. Exact integer
    day-gaps; fully ordered top-50 report."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("d"),
        F.floor(F.col("o_totalprice") / 10000)
        .cast("bigint")
        .alias("bucket"),
    )
    w = Window.partitionBy("o_custkey", "bucket").orderBy(
        "d", "o_orderkey"
    )
    r = o.select(
        "o_custkey",
        "bucket",
        F.lag("o_orderkey").over(w).alias("k1"),
        F.col("o_orderkey").alias("k2"),
        F.lag("d").over(w).alias("d1"),
        F.col("d").alias("d2"),
    ).where(F.col("k1").isNotNull())
    return (
        r.select(
            "o_custkey",
            "bucket",
            "k1",
            "k2",
            F.datediff("d2", "d1").cast("bigint").alias("gap_days"),
        )
        .where(F.col("gap_days") <= 30)
        .orderBy("gap_days", "o_custkey", "k1", "k2")
        .limit(50)
    )


def x77_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness / staleness audit per event stream: last event
    time, staleness against the corpus watermark, and a
    trailing-7-days vs prior-7-days volume comparison — the check a
    scheduled pipeline runs before trusting (or alerting on) a feed.
    ONE conditional-aggregate pass over the events scan; the corpus
    watermark arrives as a 1-row broadcast (no driver action). All
    outputs are exact integers (epoch seconds / counts), so the audit
    is bit-replayable."""
    from dislib_spark.temporal import _epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    sec = _epoch_seconds(ev, "ts")
    e = ev.select("event_type", sec.alias("sec"))
    wm = F.broadcast(e.agg(F.max("sec").alias("_wm")))
    week = 7 * 86400
    return (
        e.crossJoin(wm)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("sec").alias("last_sec"),
            (F.first("_wm") - F.max("sec")).alias("staleness_s"),
            F.sum(
                (F.col("sec") > F.col("_wm") - week).cast("long")
            ).alias("n_last7d"),
            F.sum(
                (
                    (F.col("sec") <= F.col("_wm") - week)
                    & (F.col("sec") > F.col("_wm") - 2 * week)
                ).cast("long")
            ).alias("n_prior7d"),
        )
        .orderBy("event_type")
    )


def x76_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a deterministic hash-Bernoulli sample
    (``sketches.sampled_quantiles``): the 5% md5-keyed sample is the
    mergeable sketch — per-row keep decisions make sample(A ∪ B) =
    sample(A) ∪ sample(B) exactly, so shards sample independently and
    union (mergeability pinned in tests/test_sketches.py). The
    rank-error companion of x74's deterministic histogram quantiles:
    error shrinks as 1/√(rate·n) instead of one bin width. The keep-
    filter runs scan-side (no shuffle; the scan itself still reads
    each row once); all downstream state holds only the sample."""
    from dislib_spark.sketches import sampled_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    return sampled_quantiles(
        li, "l_extendedprice", key, rate=0.05,
        qs=(0.5, 0.9, 0.99), by="l_returnflag",
    ).orderBy("l_returnflag")


def x82_stride_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ε-bounded quantile sketch
    (``sketches.stride_quantiles``): per-md5-shard sorted stride
    summaries (block minimum, block-size weight) whose worst-case
    rank error is the REPORTED ``rank_err_bound = Σ_s (stride_s−1)``
    — the KLL/MRL-style contract beside x76's hash-sample quantiles
    (probabilistic error) and x74's histogram quantiles (bin-width
    error). Summary is ≤ shards·k rows at any corpus size; the bound
    is proved and the merge law pinned in tests/test_sketches.py."""
    from dislib_spark.sketches import stride_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    return stride_quantiles(
        li, "l_extendedprice", key, qs=(0.5, 0.9, 0.99),
        k=256, shards=32,
    )


def s10_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (``streaming.windows
    .stream_stream_join``): clicks joined to same-user purchases
    within the following hour — Spark's native two-stream join whose
    state is watermark-bounded when run as a stream (parity with this
    batch form pinned in tests/test_io_streaming_multimodal.py).
    Hourly rollup: pair count, distinct converting users, mean
    click→purchase lag. Whole-second event times make the window
    boundary and the lag exact integers on any engine."""
    from dislib_spark.streaming.windows import stream_stream_join

    ev = load_table(spark, sf_dir, "events")
    j = stream_stream_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        on="user_id",
        window="1 hour",
    )
    return (
        j.groupBy(F.date_trunc("hour", "p_ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("lag_s"), 6).alias("avg_lag_s"),
        )
        .orderBy("hour")
    )


def x83_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase's revenue credited to the
    FIRST-touch and LAST-touch click channel among the user's clicks
    in the preceding 7 days — the two bookend models every attribution
    report compares (first-touch rewards acquisition, last-touch
    rewards closing). Channel is the deterministic ``'ch' + (props.k
    mod 4)`` label so the whole pipeline is value-replayable.

    Scale shape: one user-keyed equi-join with a time-range predicate
    (user-grained, the x15 contract — never a time×time cross join),
    then per-PURCHASE row_number windows (purchase-id-grained
    partitions, high cardinality). Revenue sums are DECIMAL(18,2)
    order-exact; click ties break on (c_ts, click id)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ch = F.concat(
        F.lit("ch"),
        F.pmod(
            F.get_json_object("props", "$.k").cast("long"), F.lit(4)
        ),
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
            ch.alias("channel"),
        )
        # drop clicks with missing props.k: a NULL channel would sort
        # differently across engines (Spark NULLS FIRST vs DuckDB
        # NULLS LAST) — the oracle filters identically
        .where(F.col("channel").isNotNull())
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    j = buys.join(clicks, "user_id").where(
        (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    # both bookend ranks in ONE pass over the join (same p_id
    # partitioning, so the two Window sorts share one exchange and j
    # is consumed once — no recompute, no full-outer stitch)
    wf = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    wl = Window.partitionBy("p_id").orderBy(
        F.desc("c_ts"), F.desc("c_id")
    )
    touches = (
        j.withColumn("rn_f", F.row_number().over(wf))
        .withColumn("rn_l", F.row_number().over(wl))
        .where((F.col("rn_f") == 1) | (F.col("rn_l") == 1))
    )
    return (
        touches.groupBy("channel")
        .agg(
            F.sum(
                (F.col("rn_f") == 1).cast("long")
            ).alias("n_first"),
            F.sum(
                F.when(F.col("rn_f") == 1, F.col("val")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("rev_first"),
            F.sum(
                (F.col("rn_l") == 1).cast("long")
            ).alias("n_last"),
            F.sum(
                F.when(F.col("rn_l") == 1, F.col("val")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("rev_last"),
        )
        .orderBy("channel")
    )


def x84_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top in-session event-type 3-gram paths ("view>click>purchase"
    beats "view>error>view"?) — the path-mining report behind funnel
    DISCOVERY (x15/x81 verify a known funnel; this surfaces which
    paths actually happen). x61's 30-minute sessions; consecutive
    triples via two LEADs over (user, session)-grained windows
    (never low-cardinality partitions); ordering mirrors the session
    oracle's (second, event_id) total order. Top-10 on (count desc,
    path) — rank on exact integers, engine-stable."""
    from pyspark.sql import Window

    from dislib_spark.temporal import _epoch_seconds, sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap="30 minutes", tiebreak="event_id"
    )
    sec = _epoch_seconds(sess, "ts")
    w = Window.partitionBy("user_id", "session_id").orderBy(
        sec, "event_id"
    )
    paths = (
        sess.select(
            "user_id",
            "session_id",
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e3").isNotNull())
        .select(
            F.concat_ws(
                ">", "event_type", "e2", "e3"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


def x85_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit analysis: which event type OPENS a session,
    which CLOSES it, and how often the session bounces (one event) —
    the landing/exit-page report of web analytics, generalized to
    event types. One sessionize window, then entry/exit via
    ``min_by``/``max_by`` on the (second, event_id) order key in ONE
    session-grained aggregate (no extra rank window). Exact integer
    counts; bounce cells only exist on the entry=exit diagonal."""
    from dislib_spark.temporal import _epoch_seconds, sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap="30 minutes", tiebreak="event_id"
    )
    sec = _epoch_seconds(sess, "ts")
    ord_key = F.struct(sec.alias("s"), F.col("event_id").alias("e"))
    per = sess.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", ord_key).alias("entry_type"),
        F.max_by("event_type", ord_key).alias("exit_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                (F.col("n_events") == 1).cast("long")
            ).alias("n_bounces"),
        )
        .orderBy("entry_type", "exit_type")
    )


def x86_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week audience overlap: for each consecutive week
    pair, the exact Jaccard of the two weeks' active-user SETS plus
    retained/new/lost splits — the set-algebra view of x80's growth
    ledger (x80 counts statuses; this measures audience SIMILARITY,
    the number a media/ads team quotes). One distinct (user, week)
    collapse, one self-join on week+1 keyed by user, exact integer
    set sizes — |A∩B| from the matched join, |A∪B| = |A|+|B|−|A∩B|."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    per = uw.groupBy("w").agg(F.count(F.lit(1)).alias("n_users"))
    nxt = uw.select(
        "user_id", (F.col("w") + F.expr("INTERVAL 7 DAYS")).alias("w")
    )
    inter = (
        nxt.join(uw, ["user_id", "w"])
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    prev = per.select(
        (F.col("w") + F.expr("INTERVAL 7 DAYS")).alias("w"),
        F.col("n_users").alias("n_prev"),
    )
    return (
        per.join(prev, "w")
        .join(inter, "w", "left")
        .select(
            "w",
            "n_prev",
            F.col("n_users").alias("n_curr"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            (F.col("n_users") - F.coalesce("n_retained", F.lit(0))).alias(
                "n_new"
            ),
            (F.col("n_prev") - F.coalesce("n_retained", F.lit(0))).alias(
                "n_lost"
            ),
            F.round(
                F.coalesce("n_retained", F.lit(0))
                / (
                    F.col("n_prev")
                    + F.col("n_users")
                    - F.coalesce("n_retained", F.lit(0))
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("w")
    )


def x87_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the
    engagement headline metric (DAU/WAU = "how many weekly users
    show up on a given day"). Sliding-window DISTINCT is the hard
    part at scale: instead of re-scanning a 7-day window per day,
    each distinct (user, day) row fans out to the ≤7 window-end days
    it can serve (bounded 7× explode of the already-collapsed
    user-day table — never of raw events), then one distinct count
    per window end. Exact integers; inner join on observed days
    drops the phantom post-corpus window ends."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("n_dau"))
    win = (
        ud.select(
            "user_id",
            "d",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        )
        .select(
            "user_id",
            F.expr("timestampadd(DAY, i, d)").alias("wd"),
        )
        .distinct()
    )
    wau = win.groupBy("wd").agg(F.count(F.lit(1)).alias("n_wau"))
    return (
        dau.join(wau, dau["d"] == wau["wd"])
        .select(
            "d",
            "n_dau",
            "n_wau",
            F.round(
                F.col("n_dau") / F.col("n_wau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("d")
    )


def x88_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTENT sketch table with merge-on-read — the continuous-
    profiling deployment shape: monthly stride-quantile partials of
    lineitem extendedprice (``sketches.stride_partials``, k=64,
    4 md5 shards per month) are written ``partitionBy(part)`` to a
    parquet sketch table, then global p50/p90/p99 estimates are
    computed from the STORED summary alone
    (``sketches.merged_stride_quantiles``) — the corpus is scanned
    once at write time and never again; a new month appends its own
    partition and the merge stays summary-proportional (the t37/v10
    stored-state pattern applied to sketches). The reported
    rank_err_bound is the exact Σ(stride−1) law over the stored
    (month, shard) blocks; the oracle replays the whole construction
    including the persistence no-op (doubles/longs round-trip parquet
    bit-exactly)."""
    import tempfile

    from dislib_spark.sketches import (
        merged_stride_quantiles,
        stride_partials,
    )

    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_format(
        F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM-dd"
    )
    key = F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber"))
    partials = stride_partials(
        li, "l_extendedprice", key, month, k=64, shards=4
    )
    tmp = tempfile.mkdtemp(prefix="sketch_table_")
    partials.write.partitionBy("part").mode("overwrite").parquet(tmp)
    stored = spark.read.parquet(tmp)
    return merged_stride_quantiles(stored, qs=(0.5, 0.9, 0.99))


def x89_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the fuzzy-dedup graph (``graph.k_core`` over the t28
    edge set): vertices surviving 6 peel rounds with their in-core
    degree — the dense-cluster / spam-clique membership signal that
    complements t28's triangle count (triangles say HOW clique-y the
    graph is; the core says WHICH documents sit in the dense part).
    Fixed-round peel semantics make it exactly replayable: the oracle
    unrolls the same 6 degree-filter rounds as CTE levels, and the
    engine's early fixpoint exit returns the identical frame (peeling
    is monotone — post-convergence rounds are no-ops)."""
    from dislib_spark.graph import k_core
    from dislib_spark.text.chunking import fuzzy_pairs

    d = load_table(spark, sf_dir, "documents")
    edges = fuzzy_pairs(d, prefix_len=80, bucket_tokens=2, max_dist=60)
    return k_core(edges, k=2, rounds=6).orderBy("node")


def x90_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention TRIANGLE — the wide-format generalization of
    x16's long-format cohort counts: one row per signup-cohort week
    with its size and the retention RATE at week offsets 1..7, where
    offsets past the observation horizon are NULL (not 0) — the blank
    upper-right of the classic triangle chart that keeps immature
    cohorts from reading as churned.

    Scale shape: per-user first-event frame (user-cardinality) joins
    the distinct (user, week) activity frame — the x16 join — then
    ONE map-side-combined conditional aggregate pivots the 8 offsets
    (no per-offset scans, no Spark pivot() two-pass). The 1-row
    max-week frame broadcasts for the observability mask. Rates are
    exact-integer divisions rounded to 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    off = (F.datediff(F.col("aw"), F.col("cohort_w")) / 7).cast("int")
    j = active.join(first, "user_id").select(
        "cohort_w", off.alias("off")
    )
    base = j.groupBy("cohort_w").agg(
        *[
            F.sum(F.when(F.col("off") == i, 1).otherwise(0)).alias(
                f"a{i}"
            )
            for i in range(8)
        ]
    )
    mx = ev.agg(F.date_trunc("week", F.max("ts")).alias("max_w"))
    horizon = (
        F.datediff(F.col("max_w"), F.col("cohort_w")) / 7
    ).cast("int")
    rate_cols = [
        F.when(F.lit(i) > horizon, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col(f"a{i}") / F.col("a0"), 6)
        )
        .alias(f"r{i}")
        for i in range(1, 8)
    ]
    return (
        base.crossJoin(F.broadcast(mx))
        .select(
            "cohort_w",
            F.col("a0").cast("bigint").alias("cohort_size"),
            *rate_cols,
        )
        .orderBy("cohort_w")
    )


def x91_position_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — the model
    between x83's two bookends: each purchase's revenue splits 40% to
    the first click, 40% to the last, and the remaining 20% evenly
    across the middle touches (all of it to the single touch when the
    path has one click, 50/50 when it has two — the standard
    degenerate rules). The same user-keyed 7-day range join and
    single-exchange double-rank pass as x83; weights are exact
    decimal fractions of the DECIMAL(18,2) revenue computed per touch
    row, so per-channel credit sums replay order-exactly.

    Weight arithmetic: w = 1 (n=1), 0.5 (n=2), else 0.4 at the
    bookends and 0.2/(n−2) in the middle — per-touch revenue is
    ``val · w`` carried as DOUBLE with identical operation order both
    engines; the 6-dp rounded SUM is stable because every val is a
    2-dp decimal and w is an exact small ratio."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ch = F.concat(
        F.lit("ch"),
        F.pmod(
            F.get_json_object("props", "$.k").cast("long"), F.lit(4)
        ),
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
            ch.alias("channel"),
        )
        .where(F.col("channel").isNotNull())
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(18,2)").alias("val"),
    )
    j = buys.join(clicks, "user_id").where(
        (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    wf = Window.partitionBy("p_id").orderBy("c_ts", "c_id")
    wc = Window.partitionBy("p_id")
    t = j.select(
        "p_id",
        "channel",
        "val",
        F.row_number().over(wf).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("nt"),
    )
    nt = F.col("nt").cast("double")
    w = (
        F.when(F.col("nt") == 1, F.lit(1.0))
        .when(F.col("nt") == 2, F.lit(0.5))
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("nt")),
            F.lit(0.4),
        )
        .otherwise(0.2 / (nt - 2.0))
    )
    return (
        t.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(
                F.sum(F.col("val").cast("double") * w), 6
            ).alias("credited_rev"),
        )
        .orderBy("channel")
    )


def x92_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-Exchange fact-fact join off BUCKETED storage
    (``sources.bucketing.save_bucketed``): orders and lineitem land
    as 16-bucket tables bucketBy+sortBy the join key, and the
    priority revenue rollup then joins them with NO shuffle and NO
    sort — the layout investment every nightly pipeline makes when
    the same fact-fact join runs per day at 100 TB. The oracle is the
    plain join+aggregate (bucketed storage is a value no-op); the
    zero-Exchange SMJ plan itself is pinned in
    tests/test_plans.py::test_x92_bucketed_join_plan_pinned.
    Revenue sums are DECIMAL(18,2) order-exact."""
    import tempfile

    from dislib_spark.sources.bucketing import (
        load_table_bucketed,
        save_bucketed,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    save_bucketed(
        orders, "x92_orders", ["o_orderkey"], 16,
        sort_cols=["o_orderkey"], path=f"{tmp}/orders",
    )
    save_bucketed(
        lineitem, "x92_lineitem", ["l_orderkey"], 16,
        sort_cols=["l_orderkey"], path=f"{tmp}/lineitem",
    )
    bo = load_table_bucketed(spark, "x92_orders")
    bl = load_table_bucketed(spark, "x92_lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev.cast("decimal(28,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def x93_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency sweep line: each event is an interval
    [ts, ts + value minutes]; per event type, how many ran at once at
    the worst moment, and when was that moment first reached — the
    capacity question behind connection pools, call centers and GPU
    queues. Classic sweep line made distributed: ONE scan explodes
    each interval to two (+1/−1) endpoints in exact integer
    microseconds, and the global prefix sum runs through
    ``utils.base.with_running_total`` ordered by (type, t, d, id) —
    because every interval contributes +1 and −1, each type's deltas
    telescope to zero, so the single GLOBAL prefix sum IS the
    per-type concurrency (no per-type global window, no skewed
    partition). End-before-start at equal timestamps (d ascending)
    pins the touching-intervals-don't-overlap convention; the peak
    row is recovered with a broadcast join back on (type, peak), all
    integer-exact."""
    from dislib_spark.temporal import _epoch_micros
    from dislib_spark.utils.base import with_running_total

    ev = load_table(spark, sf_dir, "events")
    t0 = _epoch_micros(ev, "ts")
    t1 = t0 + F.floor(F.col("value") * 60000000.0)
    pts = ev.select(
        "event_id",
        "event_type",
        F.explode(
            F.array(
                F.struct(
                    t0.alias("t"), F.lit(1).cast("long").alias("d")
                ),
                F.struct(
                    t1.alias("t"), F.lit(-1).cast("long").alias("d")
                ),
            )
        ).alias("p"),
    ).select(
        "event_id",
        "event_type",
        F.col("p.t").alias("t"),
        F.col("p.d").alias("d"),
    )
    cum = with_running_total(
        pts,
        "d",
        [F.col("event_type"), F.col("t"), F.col("d"), F.col("event_id")],
        out_col="conc",
    )
    pk = cum.groupBy(F.col("event_type").alias("pk_type")).agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_events"),
        F.max("conc").alias("peak"),
    )
    return (
        cum.join(
            F.broadcast(pk),
            (F.col("event_type") == F.col("pk_type"))
            & (F.col("conc") == F.col("peak")),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("peak").cast("bigint").alias("peak_concurrency"),
            F.min("t").alias("first_peak_t_us"),
        )
        .orderBy("event_type")
    )


def x94_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for every user, the time from
    their FIRST view to the first purchase strictly after it, bucketed
    into whole days (capped at 7 = "a week or more") with a NULL
    bucket for viewers who never converted — the funnel-velocity
    histogram behind every growth dashboard, and the latency
    companion to x15's step-conversion funnel. Shapes to scale: one
    filtered scan → per-user min-view aggregate (shuffle on user_id),
    purchases join back on the same key, exact integer-microsecond
    arithmetic end to end; the day buckets, counts and shares replay
    integer-exactly in the oracle."""
    from dislib_spark.temporal import _epoch_micros

    ev = load_table(spark, sf_dir, "events")
    t = _epoch_micros(ev, "ts")
    views = (
        ev.where(F.col("event_type") == "view")
        .select("user_id", t.alias("t"))
        .groupBy("user_id")
        .agg(F.min("t").alias("mv"))
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", t.alias("t")
    )
    conv = (
        buys.join(views, "user_id")
        .where(F.col("t") > F.col("mv"))
        .groupBy("user_id")
        .agg(F.min("t").alias("mp"), F.max("mv").alias("mv"))
        .select(
            "user_id",
            F.floor(
                (F.col("mp") - F.col("mv")) / F.lit(1000000.0)
            ).alias("lat_s"),
        )
    )
    bucketed = views.join(conv, "user_id", "left").select(
        F.when(
            F.col("lat_s").isNotNull(),
            F.least(
                F.floor(F.col("lat_s") / F.lit(86400.0)),
                F.lit(7).cast("long"),
            ),
        ).alias("conv_day"),
        "lat_s",
    )
    total = bucketed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        bucketed.groupBy("conv_day")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.sum("lat_s").cast("double") / F.count("lat_s"), 6
            ).alias("avg_latency_s"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "conv_day",
            "n_users",
            F.round(F.col("n_users") / F.col("n_total"), 6).alias(
                "share"
            ),
            "avg_latency_s",
        )
        .orderBy(F.col("conv_day").asc_nulls_last())
    )


def x95_header_line_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Header-vs-lines amount reconciliation: every order's
    o_totalprice is checked against the exact-decimal rollup of its
    lineitems' discounted revenue, per priority class — the
    financial-close audit (does the invoice header match the sum of
    its lines?) that complements x60's key-level integrity checks
    and x73's duplicate-billing screen with an AMOUNT-level one. One
    map-side-combined lineitem rollup keyed on order (DECIMAL(38,4),
    order-exact), one equi-join to headers on the same key, one
    per-priority fold reporting orphan headers (no lines at all) and
    the relative-gap profile."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    lines = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sum(rev.cast("decimal(28,4)")).alias("line_sum")
    )
    j = o.join(
        lines, F.col("o_orderkey") == F.col("ok"), "left"
    ).select(
        "o_orderpriority",
        "o_totalprice",
        F.col("line_sum").cast("double").alias("ls"),
    )
    rel = F.abs(F.col("o_totalprice") - F.col("ls")) / F.col(
        "o_totalprice"
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("ls").isNull(), 1).otherwise(0)
            ).alias("n_orphan_headers"),
            F.round(F.avg(rel), 6).alias("avg_rel_gap"),
            F.round(
                F.avg(F.when(rel <= 0.5, 1.0).otherwise(0.0)), 6
            ).alias("frac_within_50pct"),
        )
        .orderBy("o_orderpriority")
    )



def s14_dedup_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful streaming operators (``streaming.windows
    .dedup_then_tumbling_counts``): the event stream is doubled (an
    at-least-once redelivery), exact-deduped by event_id within the
    watermark, and the SAME query rolls the deduped stream into
    hourly per-type counts — dedup state and window state chained in
    one streaming pipeline, no intermediate topic. Counts must equal
    the single-copy hourly counts (oracle: DISTINCT over the doubled
    rows); the real availableNow run with a sentinel watermark flush
    is pinned in tests/test_io_streaming_multimodal.py."""
    from dislib_spark.streaming.windows import dedup_then_tumbling_counts

    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)
    return dedup_then_tumbling_counts(doubled).orderBy(
        "w_start", "event_type"
    )


def x96_seasonal_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical multiplicative seasonal decomposition of monthly
    order revenue: a 12-month CENTERED moving average (the ½·w₋₆ +
    ... + ½·w₊₆ even-window form) estimates trend, ratio-to-trend
    gives the detrended series, and each calendar month's mean ratio
    is its seasonal index — the textbook X-11 first pass, and the
    missing piece between x68's MoM growth and x78's weekday
    seasonality. The corpus collapses to ≤ |months| rows in one
    exact-decimal aggregate; every window runs over that tiny series
    (bounded frames, no corpus window). Edge months without a full
    ±6 neighborhood report NULL trend, mirrored exactly."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    w = Window.orderBy("mon")
    half = (
        F.lag("rev", 6).over(w) / 2.0
        + F.lag("rev", 5).over(w)
        + F.lag("rev", 4).over(w)
        + F.lag("rev", 3).over(w)
        + F.lag("rev", 2).over(w)
        + F.lag("rev", 1).over(w)
        + F.col("rev")
        + F.lead("rev", 1).over(w)
        + F.lead("rev", 2).over(w)
        + F.lead("rev", 3).over(w)
        + F.lead("rev", 4).over(w)
        + F.lead("rev", 5).over(w)
        + F.lead("rev", 6).over(w) / 2.0
    ) / 12.0
    t = m.select(
        "mon", "rev", half.alias("trend")
    )
    return (
        t.groupBy(F.month("mon").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.round(
                F.avg(F.col("rev") / F.col("trend")), 6
            ).alias("seasonal_index"),
            F.round(F.avg("rev"), 6).alias("avg_revenue"),
        )
        .orderBy("month")
    )


def x97_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence-pattern matching without the
    clause Spark lacks: each user-day session compiles to an ordered
    event-initial string (one grouped aggregate — array_sort over
    (ts, event_id)-keyed structs, then a JVM regex per pattern), and
    the patterns every funnel PM asks for run as plain RLIKE:
    browse-to-buy subsequence (v…c…p), the strict adjacent vcp
    chain, error-interrupted checkouts (c…e…p), and bounce (a
    single-event day). Entirely whole-stage-codegen: one shuffle on
    the session key, string build and all four regexes map-side; the
    oracle replays the same string via ORDER BY string_agg."""
    ev = load_table(spark, sf_dir, "events")
    ini = F.substring("event_type", 1, 1)
    sess = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.struct(
                F.col("ts"), F.col("event_id"), ini.alias("c")
            ).alias("s"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda x: x["c"],
                ),
                "",
            ).alias("path")
        )
    )
    return sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("path").rlike("v.*c.*p"), 1).otherwise(0)
        ).alias("n_browse_to_buy"),
        F.sum(
            F.when(F.col("path").rlike("vcp"), 1).otherwise(0)
        ).alias("n_strict_vcp"),
        F.sum(
            F.when(F.col("path").rlike("c.*e.*p"), 1).otherwise(0)
        ).alias("n_error_interrupted"),
        F.sum(
            F.when(F.length("path") == 1, 1).otherwise(0)
        ).alias("n_bounce"),
        F.round(
            F.avg(F.length("path").cast("double")), 6
        ).alias("avg_session_len"),
    )


def x98_experiment_readout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """End-to-end A/B experiment readout: users are assigned to
    control/treatment by the same seedless md5-parity rule the t10
    splitter uses (deterministic, re-derivable, no assignment table
    to lose), and each arm reports exposure, converter count,
    conversion rate and the pooled two-proportion z — the m35 kernel
    fed by a hash split instead of a stored flag, i.e. the readout
    query a growth team actually runs. One scan to per-user
    (arm, converted), one 2-row rollup, scalar z algebra; every
    count integer-exact, both the assignment and the z mirrored."""
    from dislib_spark.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        hash_bucket(F.col("user_id"), 2) == 0, F.lit("control")
    ).otherwise(F.lit("treatment"))
    per_user = (
        ev.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(
                    0
                )
            ).alias("converted")
        )
        .select(arm.alias("arm"), "converted")
    )
    g = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = g.agg(
        F.sum(
            F.when(F.col("arm") == "control", F.col("n_users"))
        ).alias("nc"),
        F.sum(
            F.when(F.col("arm") == "control", F.col("n_converted"))
        ).alias("xc"),
        F.sum(
            F.when(F.col("arm") == "treatment", F.col("n_users"))
        ).alias("nt"),
        F.sum(
            F.when(F.col("arm") == "treatment", F.col("n_converted"))
        ).alias("xt"),
    )
    nc = F.col("nc").cast("double")
    nt = F.col("nt").cast("double")
    xc = F.col("xc").cast("double")
    xt = F.col("xt").cast("double")
    p_pool = (xc + xt) / (nc + nt)
    se = F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / nc + 1.0 / nt))
    return wide.select(
        F.col("nc").cast("bigint").alias("n_control"),
        F.col("xc").cast("bigint").alias("conv_control"),
        F.col("nt").cast("bigint").alias("n_treatment"),
        F.col("xt").cast("bigint").alias("conv_treatment"),
        F.round(xc / nc, 6).alias("rate_control"),
        F.round(xt / nt, 6).alias("rate_treatment"),
        F.when(
            (p_pool > 0) & (p_pool < 1),
            F.round((xt / nt - xc / nc) / se, 6),
        ).alias("z"),
    )


def x99_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting demonstrated as a VALUE no-op: revenue per return
    flag computed through the two-stage salted plan — md5-salted
    (key, salt) partial aggregation, then the final merge per key —
    that a skewed key demands at 100 TB (one whale flag would
    otherwise pin a single reducer; the salt fans its rows over 16
    reducers and the merge is 16 rows per key). The oracle is the
    PLAIN group-by: salting must change the shuffle layout and
    nothing else, and exact DECIMAL partials make the re-merge
    order-independent, so the equality is bit-for-bit. The two-stage
    Exchange pair is the plan evidence (PLANS.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    from dislib_spark.sampling import hash_bucket

    # examined for fan_out in the r10 optimization pass and left
    # alone: the round-robin repartition's sort-before-repartition of
    # the full-width rows costs more than the salted partial agg saves
    # (measured 1.6 s -> 2.9 s)
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    partial = (
        li.groupBy(
            "l_returnflag",
            hash_bucket(F.col("l_orderkey"), 16).alias("_salt"),
        )
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(rev.cast("decimal(28,4)")).alias("prev"),
        )
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pn").alias("n_items"),
            F.sum("prev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_salt_cells"),
        )
        .orderBy("l_returnflag")
    )


def s11_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join (``streaming.windows
    .stream_stream_left_join``): every click accounted — matched to
    same-user purchases within the following hour, or emitted once
    unmatched when its join state expires (watermark TTL; streaming ≡
    batch parity pinned in tests/test_io_streaming_multimodal.py).
    The abandonment ledger s10's inner join can't express: hourly
    click volume, match volume, and the click-level match rate.
    Whole-second event times keep the window boundary exact."""
    from dislib_spark.streaming.windows import stream_stream_left_join

    ev = load_table(spark, sf_dir, "events")
    j = stream_stream_left_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        on="user_id",
        window="1 hour",
    )
    return (
        j.groupBy(F.date_trunc("hour", "c_ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("p_ts").alias("n_matched"),
            F.countDistinct("event_id").alias("n_clicks"),
            F.countDistinct(
                F.when(F.col("p_ts").isNull(), F.col("event_id"))
            ).alias("n_unmatched_clicks"),
            F.round(
                F.countDistinct(
                    F.when(F.col("p_ts").isNotNull(), F.col("event_id"))
                )
                / F.countDistinct("event_id").cast("double"),
                6,
            ).alias("match_rate"),
        )
        .orderBy("hour")
    )


def s12_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply, declared: a change feed derived from orders
    (latest order re-states a customer's balance; every 50th
    customer key is a delete marker) compacts to latest-per-key
    (``streaming.cdc.compact_changes``, the x43 kernel) and MERGEs
    into the customer base (``sources.merge.merge_into`` — update /
    insert / delete arms), then rolls the merged table up per
    nation. This is the batch face of ``cdc_apply_sink`` (the
    foreachBatch streaming sink runs the identical two kernels per
    micro-batch — pinned in tests/test_cdc_apply.py); one window
    over the change set + one full-outer key join, the 100 TB merge
    shape. DECIMAL(18,2) balance sums keep the rollup order-exact."""
    from dislib_spark.sources.merge import merge_into
    from dislib_spark.streaming.cdc import compact_changes

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    base = cust.select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").alias("acctbal"),
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit("I").alias("op"),
    )
    changes = orders.join(
        cust.select("c_custkey", "c_nationkey"),
        orders["o_custkey"] == cust["c_custkey"],
    ).select(
        F.col("o_custkey").alias("c_custkey"),
        "c_nationkey",
        F.col("o_totalprice").alias("acctbal"),
        F.col("o_orderdate").cast("timestamp").alias("ts"),
        F.when(F.col("o_custkey") % 50 == 0, "D")
        .otherwise("U")
        .alias("op"),
    )
    latest = compact_changes(changes, ["c_custkey"], "ts")
    merged = merge_into(
        base, latest, ["c_custkey"], F.col("op") == "D"
    )
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_balance"),
        )
        .orderBy("c_nationkey")
    )


def x78_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic seasonality profile: events bucketed by (day-of-week,
    hour-of-day) with per-cell counts, value sums and each cell's
    share of its weekday — the capacity-planning / anomaly-baseline
    matrix every ops dashboard draws. ONE map-side-combined aggregate
    over the events scan (168 output cells at any corpus size);
    money sums DECIMAL(18,2) order-exact, shares exact-int-over-
    decimal divisions."""
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.select(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
            F.col("value"),
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_v"),
        )
    )
    from pyspark.sql import Window

    wd = Window.partitionBy("dow")
    return g.select(
        "dow",
        "hod",
        "n",
        F.col("_v").cast("double").alias("sum_value"),
        F.round(F.col("n") / F.sum("n").over(wd), 6).alias("dow_share"),
    ).orderBy("dow", "hod")


def x79_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank parts by
    revenue descending, classify by cumulative revenue share (A ≤ 70%,
    B ≤ 90%, C rest) — the inventory-prioritization classic. The
    corpus-wide running total comes from ``utils.base
    .with_running_total`` (range-partitioned sort + per-partition
    offsets — the TeraSort shape, NO global Window); DECIMAL revenue
    keeps every cumulative value order-exact, and the class boundary
    compares ``cum·10 ≤ tot·7`` in exact decimal so no float boundary
    can flip a part's class between engines."""
    from dislib_spark.utils.base import with_running_total

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
        ).alias("rev")
    )
    run = with_running_total(
        rev, "rev", [F.desc("rev"), "l_partkey"], "cum"
    )
    tot = F.broadcast(rev.agg(F.sum("rev").alias("_tot")))
    cls = (
        F.when(F.col("cum") * 10 <= F.col("_tot") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("_tot") * 9, "B")
        .otherwise("C")
    )
    return (
        run.crossJoin(tot)
        .select(cls.alias("abc_class"), "rev", "_tot")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("double").alias("revenue"),
            F.round(
                F.sum("rev").cast("double")
                / F.first("_tot").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("abc_class")
    )



def x80_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (new / retained / resurrected /
    churned users) — the standard product-analytics ledger: a user's
    week is NEW if it's their first-seen week, RETAINED if they were
    also active the prior week, RESURRECTED otherwise; CHURNED counts
    prior-week users absent this week. One distinct (user, week)
    collapse, a per-user lag window (user-grained partitions — never
    low-cardinality), and a first-week join. Exact integer counts."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    from pyspark.sql import Window

    lag = Window.partitionBy("user_id").orderBy("w")
    first = Window.partitionBy("user_id")
    cls = (
        uw.withColumn("prev_w", F.lag("w").over(lag))
        .withColumn("first_w", F.min("w").over(first))
        .select(
            "w",
            F.when(F.col("w") == F.col("first_w"), "new")
            .when(
                F.col("prev_w") == F.col("w") - F.expr("INTERVAL 7 DAYS"),
                "retained",
            )
            .otherwise("resurrected")
            .alias("status"),
        )
        .groupBy("w", "status")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # churned: prior-week actives missing this week = prev actives -
    # retained; derive from the same uw frame with a shifted join.
    # Clamp to weeks <= the max observed week: the +7d shift would
    # otherwise mint a phantom week after the corpus ends in which
    # every final-week user 'churns' (ADVICE r5).
    nxt = uw.select(
        "user_id",
        (F.col("w") + F.expr("INTERVAL 7 DAYS")).alias("w"),
    )
    mx = F.broadcast(uw.agg(F.max("w").alias("_mx")))
    churn = (
        nxt.join(uw, ["user_id", "w"], "left_anti")
        .crossJoin(mx)
        .where(F.col("w") <= F.col("_mx"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select("w", F.lit("churned").alias("status"), "n_users")
    )
    return cls.unionByName(churn).orderBy("w", "status")


def x81_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel WITHIN sessions: the x15 staged-min funnel scoped to
    x61's 30-minute inactivity sessions — "did the view→click→purchase
    path complete inside ONE visit", the composition every product
    funnel actually ships (cross-session funnels overcount). A
    session converts if some click follows the session's first view
    and some purchase follows that first qualifying click.

    Scale shape: ONE sessionize window (user-grained partitions),
    then the pruned (user, session, type, ts) frame is pinned with
    localCheckpoint so the three stage aggregates reuse it instead of
    re-running the session window per consumer (the t05/t51 rule);
    stage outputs are session-cardinality equi-joins, never row×row.
    Exact integer counts; one rounded IEEE division."""
    from dislib_spark.temporal import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(
        ev, "user_id", "ts", gap="30 minutes", tiebreak="event_id"
    ).select(
        "user_id", "session_id", "event_type", "ts"
    ).localCheckpoint(eager=True)
    k = ["user_id", "session_id"]
    base = sess.groupBy(*k).agg(F.count(F.lit(1)).alias("n_ev"))
    v = (
        sess.where(F.col("event_type") == "view")
        .groupBy(*k)
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        sess.where(F.col("event_type") == "click")
        .join(v, k)
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy(*k)
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        sess.where(F.col("event_type") == "purchase")
        .join(c, k)
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy(*k)
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        base.join(v, k, "left")
        .join(c, k, "left")
        .join(p, k, "left")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count("v_ts").alias("n_view"),
            F.count("c_ts").alias("n_click"),
            F.count("p_ts").alias("n_purchase"),
            F.round(
                F.count("p_ts")
                / F.nullif(F.count("v_ts"), F.lit(0)).cast("double"),
                6,
            ).alias("conv_rate"),
        )
    )


def s13_stream_dedup_archive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming dedup-against-archive — t37's daily-crawl shape with
    the index PERSISTED and the banding in oracle-replayable md5 mode:
    the even-id archive's LSH band index is written
    ``partitionBy(band_idx)`` to parquet, and the odd-id batch probes
    the STORED index (``text.dedup.dedup_against_index``,
    ``hash_fn="md5"``) — candidates are batch-sized, the archive is
    touched only through the (band_idx, band_hash) equi-join on the
    partition-pruned index, exact Jaccard re-check on candidates
    only. This batch form is what each micro-batch executes; the REAL
    multi-micro-batch availableNow stream (maxFilesPerTrigger=1 over
    a 3-file source, foreachBatch probe) is pinned equal to it in
    tests/test_io_streaming_multimodal.py. md5 banding makes the
    whole probe value-checkable — the t05 oracle recipe on new ×
    archive candidates."""
    import tempfile

    from dislib_spark.text.dedup import dedup_against_index, minhash_index

    d = load_table(spark, sf_dir, "documents")
    ix = minhash_index(
        d.where(F.col("doc_id") % 2 == 0), hash_fn="md5"
    )
    tmp = tempfile.mkdtemp(prefix="lsh_index_")
    ix.write.partitionBy("band_idx").mode("overwrite").parquet(tmp)
    stored = spark.read.parquet(tmp)
    batch = d.where(F.col("doc_id") % 2 == 1)
    return dedup_against_index(
        batch, stored, threshold=0.3, hash_fn="md5"
    ).orderBy("new_id", "index_id")


def x100_bitemporal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal rewrite audit — how much did LATE data rewrite
    history? The x65 SCD2 build runs twice: once on the events known
    at first load (event_id % 7 != 0 — the on-time feed) and once
    after the late corrections land (all events); three pinned
    instants are as-of-probed against BOTH dimensions (x13's as-of
    semantics via the broadcast-probe interval join) and the report
    counts, per probe, how many users' point-in-time answer CHANGED
    and how many became visible only after corrections — the audit
    any warehouse with late-arriving CDC runs before trusting a
    backfilled dashboard. Two per-user lead windows + one broadcast
    probe join each; the initial feed is a subset of the corrected
    one, so corrected visibility ⊇ initial visibility by
    construction (the left join is exact, not heuristic)."""
    from pyspark.sql import Window

    from dislib_spark.temporal import _epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    sec = _epoch_seconds(ev, "ts")
    base = ev.select(
        "user_id", "event_id", "event_type", sec.alias("_s")
    )

    def build(src: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("_s", "event_id")
        return src.select(
            "user_id",
            "event_type",
            F.col("_s").alias("valid_from"),
            F.coalesce(F.lead("_s").over(w), F.lit(2**62)).alias(
                "valid_to"
            ),
        )

    probes = spark.range(3).select(
        (F.lit(1704844800) + F.col("id") * 864000).alias("probe_s")
    )  # 2024-01-10 / -20 / -30 00:00:00Z, the x65 instants

    def asof(dim: DataFrame, et: str) -> DataFrame:
        return dim.join(
            F.broadcast(probes),
            (F.col("valid_from") <= F.col("probe_s"))
            & (F.col("probe_s") < F.col("valid_to")),
        ).select("probe_s", "user_id", F.col("event_type").alias(et))

    initial = asof(
        build(base.where(F.col("event_id") % 7 != 0)), "et_i"
    )
    corrected = asof(build(base), "et_c")
    j = corrected.join(initial, ["probe_s", "user_id"], "left")
    return (
        j.groupBy("probe_s")
        .agg(
            F.count(F.lit(1)).alias("n_visible_corrected"),
            F.sum(F.col("et_i").isNotNull().cast("long")).alias(
                "n_visible_initial"
            ),
            F.sum(
                (
                    F.col("et_i").isNotNull()
                    & (F.col("et_i") != F.col("et_c"))
                ).cast("long")
            ).alias("n_answer_changed"),
            F.sum(F.col("et_i").isNull().cast("long")).alias(
                "n_newly_visible"
            ),
        )
        .orderBy("probe_s")
    )


def x101_hll_union_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-scope distinct-user report from STORED, engine-
    replayable HLL registers (``sketches.md5_hll_partials``): per-
    event-type register partials are persisted partitionBy(scope) —
    the x88 merge-on-read deployment shape — then every estimate,
    including the all-types union, is computed from the STORED
    summary alone (register MAX is the HLL merge law; the corpus is
    never rescanned for a new scope combination). Each row carries
    the exact COUNT(DISTINCT) alongside, so rel_err IS the audit:
    the accuracy check x14's DataSketches path can only pytest-gate
    is value-checked here end to end, because the md5-derived
    register state replays bit-identically in ANSI SQL."""
    import tempfile

    from dislib_spark.sketches import md5_hll_estimate, md5_hll_partials

    ev = load_table(spark, sf_dir, "events")
    partials = md5_hll_partials(
        ev, "user_id", ["event_type"]
    ).withColumnRenamed("event_type", "scope")
    tmp = tempfile.mkdtemp(prefix="hll_regs_")
    partials.write.partitionBy("scope").mode("overwrite").parquet(tmp)
    stored = spark.read.parquet(tmp)

    per_scope = md5_hll_estimate(stored, ["scope"])
    merged = md5_hll_estimate(stored).select(
        F.lit("__all__").alias("scope"),
        "hll_estimate",
        "n_nonzero_regs",
    )
    est = per_scope.unionByName(merged)
    exact_scope = ev.groupBy(
        F.col("event_type").alias("scope")
    ).agg(F.count_distinct("user_id").alias("exact_distinct"))
    exact_all = ev.agg(
        F.count_distinct("user_id").alias("exact_distinct")
    ).select(F.lit("__all__").alias("scope"), "exact_distinct")
    exact = exact_scope.unionByName(exact_all)
    return (
        est.join(exact, "scope")
        .select(
            "scope",
            F.col("exact_distinct").cast("bigint").alias(
                "exact_distinct"
            ),
            "hll_estimate",
            F.round(
                F.abs(
                    F.col("hll_estimate")
                    - F.col("exact_distinct").cast("double")
                )
                / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
            "n_nonzero_regs",
        )
        .orderBy("scope")
    )


def x102_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-planning audit: before picking a Structured
    Streaming watermark delay, measure how LATE the feed actually
    runs — for each candidate delay, how many events arrive with an
    event time more than that far behind the maximum event time
    already ingested (arrival order ≈ event_id), i.e. exactly the
    rows ``withWatermark`` would drop. The strict-predecessor
    running max comes from ``utils.base.with_running_max``
    (range-sort + per-partition maxima + within-partition window —
    the x93 prefix primitive lifted from sums to order statistics;
    never a global Window), one aggregate folds all candidate
    delays, and a 4-row stack unpivots the report. Counts are exact
    longs; shares exact long/long divisions."""
    from dislib_spark.temporal import _epoch_seconds
    from dislib_spark.utils.base import with_running_max

    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_id", _epoch_seconds(ev, "ts").alias("t")
    )
    r = with_running_max(
        src, "t", ["event_id"], "prev_max", inclusive=False
    )
    late = F.col("prev_max") - F.col("t")
    delays = [0, 60, 300, 3600]
    aggs = [F.count(F.lit(1)).alias("n")]
    for d in delays:
        aggs.append(
            F.sum((late > d).cast("long")).alias(f"n_{d}")
        )
    aggs.append(F.max(late).alias("max_late_s"))
    w = r.agg(*aggs)
    stack = ", ".join(f"{d}, n_{d}" for d in delays)
    return (
        w.selectExpr(
            "n",
            "max_late_s",
            f"stack({len(delays)}, {stack}) AS "
            "(watermark_delay_s, n_dropped)",
        )
        .select(
            F.col("watermark_delay_s").cast("int").alias(
                "watermark_delay_s"
            ),
            F.col("n_dropped").cast("bigint").alias("n_dropped"),
            F.round(
                F.col("n_dropped").cast("double") / F.col("n"), 6
            ).alias("drop_share"),
            F.col("max_late_s").cast("bigint").alias("max_late_s"),
        )
        .orderBy("watermark_delay_s")
    )


def s15_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length histogram over TIMEOUT-BASED sessionization
    (``streaming.stateful.stream_sessions``, 15-minute gap) — the
    module code path whose streaming form is a REAL
    transformWithState processor with per-key event-time TIMERS
    (idle sessions close when the watermark passes start+gap, not at
    an artificial batch boundary); the batch form replays the
    identical gaps-and-islands semantics, and the two are pinned
    equal on a real availableNow multi-batch stream in
    tests/test_io_streaming_multimodal.py. Histogram = one groupBy
    over session-cardinality rows."""
    from dislib_spark.streaming.stateful import stream_sessions

    ev = load_table(spark, sf_dir, "events")
    sess = stream_sessions(ev, gap="15 minutes")
    return (
        sess.groupBy(F.col("n_events"))
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("n_events")
    )


def x103_forgotten_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten erasure audit (``sources.merge
    .erase_keys_path``): the event mart is persisted
    partitionBy(day), one GDPR batch (user_id ≡ 0 mod 97) is erased
    with PARTITION-SCOPED copy-on-write — only the days holding an
    erased user's rows are rewritten; the table is never fully
    rewritten (the 100 TB erasure contract, same shape as
    v24/v29's index maintenance) — and the report proves it from
    the STORED table: per-type before/after/erased counts, the
    erased-user cardinality, the residual-row count (the compliance
    invariant, value-checked at 0 — the x99 prove-the-property
    pattern), and the rewritten-partition count (= the erased keys'
    day fan-out, which the oracle replays exactly)."""
    import tempfile

    from dislib_spark.sources.merge import erase_keys_path

    ev = load_table(spark, sf_dir, "events")
    mart = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="gdpr_mart_")
    path = f"{tmp}/events_mart"
    mart.write.partitionBy("day").mode("overwrite").parquet(path)
    erased = ev.where(F.col("user_id") % 97 == 0).select(
        "user_id"
    ).distinct()
    n_parts = erase_keys_path(spark, path, erased, "user_id", "day")
    stored = spark.read.parquet(path)

    before = mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = stored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    residual = stored.join(
        F.broadcast(erased), "user_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_residual_rows"))
    totals = erased.agg(
        F.count(F.lit(1)).alias("n_users_erased")
    )
    return (
        before.join(after, "event_type", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(residual))
        .select(
            "event_type",
            F.col("n_before").cast("bigint").alias("n_before"),
            F.coalesce(F.col("n_after"), F.lit(0))
            .cast("bigint")
            .alias("n_after"),
            (
                F.col("n_before")
                - F.coalesce(F.col("n_after"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_erased"),
            F.col("n_users_erased").cast("bigint").alias(
                "n_users_erased"
            ),
            F.col("n_residual_rows").cast("bigint").alias(
                "n_residual_rows"
            ),
            F.lit(n_parts).cast("bigint").alias(
                "n_parts_rewritten"
            ),
        )
        .orderBy("event_type")
    )


def x104_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-version DIFF — the lakehouse audit between two snapshots
    of the same keyed table (what Delta/Iceberg's time travel is FOR,
    expressed engine-agnostically): snapshot A is the on-time feed
    (event_id % 7 ≠ 0), snapshot B the next version (late rows
    landed, ids ≡ 0 mod 13 purged, values of ids ≡ 0 mod 11 restated
    +1). ONE full-outer equi-join on the key classifies every row as
    added / deleted / changed / unchanged; per-type counts are exact
    longs. This is the x51-MERGE's read-side complement: MERGE writes
    a new version, this quantifies what changed between two — the
    reconciliation report every backfill/restatement review starts
    from."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    a = ev.where(F.col("event_id") % 7 != 0)
    b = ev.where(F.col("event_id") % 13 != 0).select(
        "event_id",
        "event_type",
        "user_id",
        F.when(
            F.col("event_id") % 11 == 0, F.col("value") + 1.0
        )
        .otherwise(F.col("value"))
        .alias("value"),
    )
    j = a.select(
        F.col("event_id").alias("k"),
        F.col("event_type").alias("ta"),
        F.col("value").alias("va"),
    ).join(
        b.select(
            F.col("event_id").alias("k"),
            F.col("event_type").alias("tb"),
            F.col("value").alias("vb"),
        ),
        "k",
        "full_outer",
    )
    et = F.coalesce(F.col("tb"), F.col("ta"))
    return (
        j.groupBy(et.alias("event_type"))
        .agg(
            F.sum(F.col("ta").isNotNull().cast("long")).alias("n_a"),
            F.sum(F.col("tb").isNotNull().cast("long")).alias("n_b"),
            F.sum(
                (F.col("ta").isNull() & F.col("tb").isNotNull())
                .cast("long")
            ).alias("n_added"),
            F.sum(
                (F.col("ta").isNotNull() & F.col("tb").isNull())
                .cast("long")
            ).alias("n_deleted"),
            F.sum(
                (
                    F.col("ta").isNotNull()
                    & F.col("tb").isNotNull()
                    & (F.col("va") != F.col("vb"))
                ).cast("long")
            ).alias("n_changed"),
        )
        .orderBy("event_type")
    )


def x105_erasure_propagation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GDPR erasure PROPAGATED into a downstream aggregate — the hard
    half of right-to-be-forgotten that x103 leaves open: deleting the
    fact rows is not enough while a derived rollup still embeds the
    erased users' contributions. The mart is persisted
    partitionBy(day) alongside a (day, event_type) rollup table
    derived from it (the x47 incremental-view shape, also stored
    partitionBy(day)); the erasure batch rewrites only its fan-out
    day partitions (``erase_keys_path``), and the rollup is repaired
    INCREMENTALLY: only the touched days' groups are recomputed from
    the post-erase mart and swapped into the stored rollup with the
    same crash-safe ``replace_partitions_path`` — history partials
    are never rescanned, so propagation cost tracks the erasure
    fan-out, never the mart or the rollup. The audit proves the
    propagated rollup equals a FULL recompute from the erased mart
    (n_stale_groups, value-checked at 0 — the x99
    prove-the-property pattern) and reports the per-type forgotten
    row and value totals (DECIMAL-exact)."""
    import tempfile

    from dislib_spark.sources.merge import (
        erase_keys_path,
        replace_partitions_path,
    )

    ev = load_table(spark, sf_dir, "events")
    mart = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="gdpr_prop_")
    mpath = f"{tmp}/mart"
    rpath = f"{tmp}/rollup"
    mart.write.partitionBy("day").mode("overwrite").parquet(mpath)

    def rollup_of(side: DataFrame) -> DataFrame:
        return side.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )

    stored_mart = spark.read.parquet(mpath)
    rollup_of(stored_mart).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(rpath)
    before = spark.read.parquet(rpath).localCheckpoint(eager=True)

    erased = (
        ev.where(F.col("user_id") % 97 == 0).select("user_id").distinct()
    )
    # the erasure's day fan-out, read BEFORE the rewrite — this scopes
    # both the mart erasure and the rollup repair
    touched = [
        r["day"]
        for r in stored_mart.join(
            F.broadcast(erased), "user_id", "left_semi"
        )
        .select("day")
        .distinct()
        .collect()
    ]
    erase_keys_path(spark, mpath, erased, "user_id", "day")
    post_mart = spark.read.parquet(mpath)
    repaired = rollup_of(post_mart.where(F.col("day").isin(touched)))
    replace_partitions_path(rpath, "day", touched, repaired)

    propagated = spark.read.parquet(rpath)
    recomputed = rollup_of(post_mart)
    stale = (
        propagated.select("day", "event_type", "n", "sv")
        .exceptAll(recomputed.select("day", "event_type", "n", "sv"))
        .unionAll(
            recomputed.select("day", "event_type", "n", "sv").exceptAll(
                propagated.select("day", "event_type", "n", "sv")
            )
        )
        .agg(F.count(F.lit(1)).alias("n_stale_groups"))
    )
    b = before.groupBy("event_type").agg(
        F.sum("n").alias("rows_before"), F.sum("sv").alias("val_before")
    )
    a = propagated.groupBy("event_type").agg(
        F.sum("n").alias("rows_after"), F.sum("sv").alias("val_after")
    )
    return (
        b.join(a, "event_type", "left")
        .crossJoin(F.broadcast(stale))
        .select(
            "event_type",
            F.col("rows_before").cast("bigint").alias("rows_before"),
            F.coalesce("rows_after", F.lit(0))
            .cast("bigint")
            .alias("rows_after"),
            (
                F.col("rows_before")
                - F.coalesce("rows_after", F.lit(0))
            )
            .cast("bigint")
            .alias("rows_forgotten"),
            F.round(
                (
                    F.col("val_before")
                    - F.coalesce(F.col("val_after"), F.lit(0))
                ).cast("double"),
                6,
            ).alias("value_forgotten"),
            F.col("n_stale_groups").cast("bigint").alias(
                "n_stale_groups"
            ),
            F.lit(len(touched)).cast("bigint").alias("n_days_repaired"),
        )
        .orderBy("event_type")
    )


def s16_streaming_erasure(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x103's forget-me key feed consumed as a STREAM
    (``streaming.cdc.erasure_sink``): erasure requests arrive in
    micro-batches and each batch is applied to the partitionBy(day)
    mart with the same partition-scoped crash-safe
    ``erase_keys_path`` — the operational GDPR shape (requests
    trickle in; the table forgets continuously, not in quarterly
    rewrites). The feed is drained availableNow with
    maxFilesPerTrigger=1 so a REAL batch boundary crosses the key set
    (users ≡0 mod 194 land before the other half of the ≡0 mod 97
    set); erasure is idempotent and batch-associative, so the batched
    replay must equal the one-shot logical erase — which is exactly
    what the oracle replays, plus the per-round partition fan-outs
    the two micro-batches each rewrote."""
    import tempfile

    from dislib_spark.streaming.cdc import erasure_sink

    ev = load_table(spark, sf_dir, "events")
    mart = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="gdpr_stream_")
    mpath = f"{tmp}/mart"
    feed = f"{tmp}/feed"
    ckpt = f"{tmp}/ckpt"
    mart.write.partitionBy("day").mode("overwrite").parquet(mpath)
    uid = F.col("user_id")
    r1 = ev.where(uid % 194 == 0).select("user_id").distinct()
    r2 = (
        ev.where((uid % 97 == 0) & (uid % 194 != 0))
        .select("user_id")
        .distinct()
    )
    r1.coalesce(1).write.mode("overwrite").parquet(feed)
    r2.coalesce(1).write.mode("append").parquet(feed)

    counts: list[int] = []
    q = erasure_sink(
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed),
        mpath,
        ckpt,
        "user_id",
        "day",
        counts=counts,
        availableNow=True,
    )
    await_drain(q, 300)
    stored = spark.read.parquet(mpath)
    erased = ev.where(uid % 97 == 0).select("user_id").distinct()
    before = mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = stored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    residual = stored.join(
        F.broadcast(erased), "user_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_residual_rows"))
    totals = erased.agg(F.count(F.lit(1)).alias("n_users_erased"))
    return (
        before.join(after, "event_type", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(residual))
        .select(
            "event_type",
            F.col("n_before").cast("bigint").alias("n_before"),
            F.coalesce("n_after", F.lit(0))
            .cast("bigint")
            .alias("n_after"),
            (F.col("n_before") - F.coalesce("n_after", F.lit(0)))
            .cast("bigint")
            .alias("n_erased"),
            F.col("n_users_erased").cast("bigint").alias(
                "n_users_erased"
            ),
            F.col("n_residual_rows").cast("bigint").alias(
                "n_residual_rows"
            ),
            F.lit(sum(counts)).cast("bigint").alias(
                "n_parts_rewritten_total"
            ),
        )
        .orderBy("event_type")
    )


def x106_erasure_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user erasure CERTIFICATE — the evidence record a data-
    protection officer files per forget-me request (x103 proves the
    table-level invariant; regulators ask for per-subject receipts):
    for each erased user, the rows removed, the day span their data
    covered, the distinct partitions touched, and a post-erase
    residual count value-checked at 0 per user. Snapshot stats are
    taken BEFORE the erase (one scan, grouped per user), the erase
    runs partition-scoped as in x103, and the residual probe runs
    against the stored post-erase table. Output bounded to the 20
    lowest erased user ids — certificate volume tracks the request
    batch, never the corpus."""
    import tempfile

    from dislib_spark.sources.merge import erase_keys_path

    ev = load_table(spark, sf_dir, "events")
    mart = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="gdpr_cert_")
    path = f"{tmp}/mart"
    mart.write.partitionBy("day").mode("overwrite").parquet(path)
    erased = (
        ev.where(F.col("user_id") % 97 == 0).select("user_id").distinct()
    )
    cert = (
        mart.join(F.broadcast(erased), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows_erased"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
            F.count_distinct("day").alias("n_days_touched"),
        )
        .localCheckpoint(eager=True)
    )
    erase_keys_path(spark, path, erased, "user_id", "day")
    stored = spark.read.parquet(path)
    residual = stored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_res")
    )
    return (
        cert.join(residual, "user_id", "left")
        .select(
            "user_id",
            F.col("n_rows_erased").cast("bigint").alias("n_rows_erased"),
            "first_day",
            "last_day",
            F.col("n_days_touched").cast("bigint").alias(
                "n_days_touched"
            ),
            F.coalesce("n_res", F.lit(0))
            .cast("bigint")
            .alias("n_residual_rows"),
        )
        .orderBy("user_id")
        .limit(20)
    )


def x107_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy (TTL) enforcement PLAN over the partitioned
    mart — the triage that makes data expiry affordable at 100 TB:
    per day partition, classify against PER-TYPE TTLs anchored at the
    corpus watermark (error logs keep 10 days, clicks 20, everything
    else 25): DROP when every row in the day is past its class TTL
    (delete the directory, zero rows read), KEEP when nothing expired
    (untouched), REWRITE only when expired and surviving rows share a
    partition — the only class that costs a copy-on-write. Reports
    per-class partition counts, row volumes, and the reclaim ratio;
    the classification reads ONLY per-partition aggregates (one
    grouped scan + a 1-row watermark broadcast), never a row-level
    delete plan."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        F.max(F.date_trunc("day", "ts")).alias("max_day")
    )
    mart = ev.crossJoin(F.broadcast(wm)).select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
        F.datediff(
            F.col("max_day"), F.date_trunc("day", "ts")
        ).alias("age"),
        "event_type",
    )
    ttl = (
        F.when(F.col("event_type") == "error", 10)
        .when(F.col("event_type") == "click", 20)
        .otherwise(25)
    )
    expired = F.col("age") > ttl
    per_day = mart.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(expired.cast("long")).alias("n_expired"),
    )
    action = (
        F.when(F.col("n_expired") == 0, "KEEP")
        .when(F.col("n_expired") == F.col("n_rows"), "DROP")
        .otherwise("REWRITE")
    )
    return (
        per_day.select(
            action.alias("action"), "n_rows", "n_expired"
        )
        .groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_expired").cast("bigint").alias("n_rows_expired"),
            F.round(
                F.sum("n_expired") / F.sum("n_rows"), 6
            ).alias("reclaim_ratio"),
        )
        .orderBy("action")
    )


def x108_retention_execute(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x107's retention plan EXECUTED — the TTL twin of x105: the
    mart is persisted partitionBy(day), classified against the same
    per-type TTLs (error 10 / click 20 / other 25 days, anchored at
    the corpus watermark), and enforced with
    ``sources.merge.enforce_retention_path``: DROP days removed as
    whole directories (zero rows read), REWRITE days rebuilt
    copy-on-write through the journaled crash-safe
    ``replace_partitions_path`` swap, KEEP days never touched. The
    audit then proves post-state ≡ plan FROM DISK: per action class,
    the partitions still present, the surviving rows, and a stale-row
    count (rows on disk that the policy says should be gone) —
    value-checked at 0 — plus the executed drop/rewrite counts, which
    must equal the plan's class sizes."""
    import tempfile

    from dislib_spark.sources.merge import enforce_retention_path

    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        F.max(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        ).alias("d")
    ).first()["d"]
    mart = ev.select(
        "event_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="ttl_exec_")
    mpath = f"{tmp}/mart"
    mart.write.partitionBy("day").mode("overwrite").parquet(mpath)

    ttl = (
        F.when(F.col("event_type") == "error", 10)
        .when(F.col("event_type") == "click", 20)
        .otherwise(25)
    )
    age = F.datediff(
        F.lit(wm).cast("date"), F.col("day").cast("date")
    )
    expired = age > ttl

    stored = spark.read.parquet(mpath)
    plan = (
        stored.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(expired.cast("long")).alias("n_expired"),
        )
        .select(
            "day",
            "n_rows",
            "n_expired",
            F.when(F.col("n_expired") == 0, "KEEP")
            .when(F.col("n_expired") == F.col("n_rows"), "DROP")
            .otherwise("REWRITE")
            .alias("action"),
        )
        .localCheckpoint(eager=True)
    )
    n_drop, n_rewrite = enforce_retention_path(
        spark, mpath, "day", ttl, wm
    )
    post = (
        spark.read.parquet(mpath)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_after"),
            F.sum(expired.cast("long")).alias("n_stale"),
        )
    )
    return (
        plan.join(post, "day", "left")
        .groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum(
                F.col("n_after").isNotNull().cast("long")
            ).cast("bigint").alias("n_parts_after"),
            F.sum("n_rows").cast("bigint").alias("n_rows_before"),
            F.sum("n_expired").cast("bigint").alias("n_rows_expired"),
            F.sum(F.coalesce("n_after", F.lit(0)))
            .cast("bigint")
            .alias("n_rows_after"),
            F.sum(F.coalesce("n_stale", F.lit(0)))
            .cast("bigint")
            .alias("n_stale_rows"),
        )
        .select(
            "*",
            F.lit(n_drop).cast("bigint").alias("n_dropped_exec"),
            F.lit(n_rewrite).cast("bigint").alias("n_rewritten_exec"),
        )
        .orderBy("action")
    )


def x109_retention_certificate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-PARTITION retention receipt — the x106 evidence-record twin
    for TTL expiry (a data officer files per-partition receipts for
    what expiry removed, not just x108's class totals): for each day
    the enforcement touched (DROP or REWRITE — KEEP days produce no
    receipt), the rows before, the rows the policy expired, the rows
    actually on disk after, whether the directory itself was removed,
    and a post-state stale count value-checked at 0. Snapshot stats
    are taken from the stored mart BEFORE enforcement; the post
    columns are read back FROM DISK after ``enforce_retention_path``
    runs. Output bounded to the 20 earliest touched days —
    certificate volume tracks the touched set, never the table."""
    import tempfile

    from dislib_spark.sources.merge import enforce_retention_path

    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        F.max(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        ).alias("d")
    ).first()["d"]
    mart = ev.select(
        "event_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="ttl_cert_")
    mpath = f"{tmp}/mart"
    mart.write.partitionBy("day").mode("overwrite").parquet(mpath)

    ttl = (
        F.when(F.col("event_type") == "error", 10)
        .when(F.col("event_type") == "click", 20)
        .otherwise(25)
    )
    expired = (
        F.datediff(F.lit(wm).cast("date"), F.col("day").cast("date"))
        > ttl
    )
    stored = spark.read.parquet(mpath)
    plan = (
        stored.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows_before"),
            F.sum(expired.cast("long")).alias("n_rows_expired"),
        )
        .where(F.col("n_rows_expired") > 0)
        .select(
            F.col("day").cast("string").alias("day"),
            "n_rows_before",
            "n_rows_expired",
            F.when(
                F.col("n_rows_expired") == F.col("n_rows_before"),
                "DROP",
            )
            .otherwise("REWRITE")
            .alias("action"),
        )
        .localCheckpoint(eager=True)
    )
    enforce_retention_path(spark, mpath, "day", ttl, wm)
    post = (
        spark.read.parquet(mpath)
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_after"),
            F.sum(expired.cast("long")).alias("n_stale"),
        )
    )
    return (
        plan.join(post, "day", "left")
        .select(
            "day",
            "action",
            F.col("n_rows_before").cast("bigint").alias(
                "n_rows_before"
            ),
            F.col("n_rows_expired").cast("bigint").alias(
                "n_rows_expired"
            ),
            F.coalesce("n_after", F.lit(0))
            .cast("bigint")
            .alias("n_rows_after"),
            F.col("n_after").isNull().cast("int").alias("dir_removed"),
            F.coalesce("n_stale", F.lit(0))
            .cast("bigint")
            .alias("n_stale_rows"),
        )
        .orderBy("day")
        .limit(20)
    )


def x110_erasure_then_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The two partition-scoped mutations COMPOSED on one mart —
    the operational reality where GDPR erasure (x103) and TTL expiry
    (x108) run against the same table: erase the ≡0 mod 97 users
    first, then enforce retention at the corpus watermark, both
    through the same crash-safe swap. Row-level predicates commute,
    so the disk post-state must equal the one-shot logical filter
    (NOT erased AND NOT expired) — the oracle replays that — while
    the phase partition-touch counts are order-specific and reported
    for this order: the erase fan-out over the original mart, then
    DROP/REWRITE classes over the post-erase state. Residual probes
    (erased rows left, expired rows left) are value-checked at 0."""
    import tempfile

    from dislib_spark.sources.merge import (
        enforce_retention_path,
        erase_keys_path,
    )

    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        F.max(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        ).alias("d")
    ).first()["d"]
    mart = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="gdpr_ttl_")
    mpath = f"{tmp}/mart"
    mart.write.partitionBy("day").mode("overwrite").parquet(mpath)

    erased = (
        ev.where(F.col("user_id") % 97 == 0).select("user_id").distinct()
    )
    n_parts_erase = erase_keys_path(
        spark, mpath, erased, "user_id", "day"
    )
    ttl = (
        F.when(F.col("event_type") == "error", 10)
        .when(F.col("event_type") == "click", 20)
        .otherwise(25)
    )
    n_drop, n_rewrite = enforce_retention_path(
        spark, mpath, "day", ttl, wm
    )

    expired = (
        F.datediff(F.lit(wm).cast("date"), F.col("day").cast("date"))
        > ttl
    )
    post = spark.read.parquet(mpath)
    before = mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = post.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    res_erased = post.join(
        F.broadcast(erased), "user_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_residual_erased"))
    res_expired = post.where(expired).agg(
        F.count(F.lit(1)).alias("n_residual_expired")
    )
    return (
        before.join(after, "event_type", "left")
        .crossJoin(F.broadcast(res_erased))
        .crossJoin(F.broadcast(res_expired))
        .select(
            "event_type",
            F.col("n_before").cast("bigint").alias("n_before"),
            F.coalesce("n_after", F.lit(0))
            .cast("bigint")
            .alias("n_after"),
            F.col("n_residual_erased").cast("bigint").alias(
                "n_residual_erased"
            ),
            F.col("n_residual_expired").cast("bigint").alias(
                "n_residual_expired"
            ),
            F.lit(n_parts_erase).cast("bigint").alias("n_parts_erase"),
            F.lit(n_drop).cast("bigint").alias("n_parts_dropped"),
            F.lit(n_rewrite).cast("bigint").alias("n_parts_rewritten"),
        )
        .orderBy("event_type")
    )


def x111_retention_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retention TRANSITION forecast — the capacity-planning
    complement of x107's point-in-time plan: classify every day
    partition at the current watermark AND at watermark+7 days, and
    report the transition matrix (action_now → action_next_week)
    with partition counts, row volumes, and the rows that newly
    expire inside the window. The DROP-bound cells are next week's
    reclaim bill; KEEP→REWRITE cells are the partitions that start
    costing copy-on-write. Pure per-partition aggregate
    classification (ONE grouped scan + a 1-row watermark broadcast),
    no execution, exact integer counts."""
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        F.max(F.date_trunc("day", "ts")).alias("max_day")
    )
    ttl = (
        F.when(F.col("event_type") == "error", 10)
        .when(F.col("event_type") == "click", 20)
        .otherwise(25)
    )
    age = F.datediff(F.col("max_day"), F.date_trunc("day", "ts"))
    per_day = (
        ev.crossJoin(F.broadcast(wm))
        .select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
            .alias("day"),
            (age > ttl).cast("long").alias("exp_now"),
            ((age + 7) > ttl).cast("long").alias("exp_next"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("exp_now").alias("e_now"),
            F.sum("exp_next").alias("e_next"),
        )
    )

    def action(e):
        return (
            F.when(F.col(e) == 0, "KEEP")
            .when(F.col(e) == F.col("n_rows"), "DROP")
            .otherwise("REWRITE")
        )

    return (
        per_day.select(
            action("e_now").alias("action_now"),
            action("e_next").alias("action_next"),
            "n_rows",
            (F.col("e_next") - F.col("e_now")).alias("newly_exp"),
        )
        .groupBy("action_now", "action_next")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("newly_exp").cast("bigint").alias(
                "n_rows_newly_expiring"
            ),
        )
        .orderBy("action_now", "action_next")
    )


def s17_streaming_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """x108's TTL enforcement driven from a STREAM of watermark ticks
    (``streaming.cdc.retention_sink``) — the operational shape where
    a scheduler emits "now = d" ticks and the table expires
    continuously instead of in quarterly rewrites. Two ticks drained
    availableNow with maxFilesPerTrigger=1 (a REAL micro-batch
    boundary): first at watermark−3 days, then at the watermark;
    retention is idempotent and watermark-monotone, so the ticked
    replay must leave exactly the one-shot enforcement's table —
    which the oracle replays logically — and the per-tick touched-
    partition counts decompose as (days with any row expired at
    wm−3) + (days with a row that survives wm−3 but expires at wm)."""
    import datetime
    import tempfile

    from dislib_spark.streaming.cdc import retention_sink

    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        F.max(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        ).alias("d")
    ).first()["d"]
    wm_early = (
        datetime.date.fromisoformat(wm) - datetime.timedelta(days=3)
    ).isoformat()
    mart = ev.select(
        "event_id",
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    tmp = tempfile.mkdtemp(prefix="ttl_stream_")
    mpath = f"{tmp}/mart"
    feed = f"{tmp}/ticks"
    ckpt = f"{tmp}/ckpt"
    mart.write.partitionBy("day").mode("overwrite").parquet(mpath)
    spark.createDataFrame([(wm_early,)], "as_of string").coalesce(
        1
    ).write.mode("overwrite").parquet(feed)
    spark.createDataFrame([(wm,)], "as_of string").coalesce(
        1
    ).write.mode("append").parquet(feed)

    ttl = (
        F.when(F.col("event_type") == "error", 10)
        .when(F.col("event_type") == "click", 20)
        .otherwise(25)
    )
    counts: list[tuple[int, int]] = []
    q = retention_sink(
        spark.readStream.schema("as_of string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed),
        mpath,
        ckpt,
        "day",
        ttl,
        counts=counts,
        availableNow=True,
    )
    await_drain(q, 300)

    expired_final = (
        F.datediff(F.lit(wm).cast("date"), F.col("day").cast("date"))
        > ttl
    )
    post = spark.read.parquet(mpath)
    before = mart.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = post.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    residual = post.where(expired_final).agg(
        F.count(F.lit(1)).alias("n_residual_expired")
    )
    touched = sum(d + r for d, r in counts)
    return (
        before.join(after, "event_type", "left")
        .crossJoin(F.broadcast(residual))
        .select(
            "event_type",
            F.col("n_before").cast("bigint").alias("n_before"),
            F.coalesce("n_after", F.lit(0))
            .cast("bigint")
            .alias("n_after"),
            (F.col("n_before") - F.coalesce("n_after", F.lit(0)))
            .cast("bigint")
            .alias("n_expired"),
            F.col("n_residual_expired").cast("bigint").alias(
                "n_residual_expired"
            ),
            F.lit(len(counts)).cast("bigint").alias("n_ticks"),
            F.lit(touched).cast("bigint").alias(
                "n_parts_touched_total"
            ),
        )
        .orderBy("event_type")
    )


def s18_streaming_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 dimension maintenance — the streaming twin of
    x65's batch build, completing the warehouse-sink family (s12
    upserts, s16 erasure, s17 retention): a two-batch change feed
    (split by event parity, so the SECOND batch carries events that
    predate the first — the out-of-order case) folds into a
    bucket-partitioned dimension via ``streaming.cdc.scd2_sink``.
    Each batch rewrites only the buckets its keys hash into
    (copy-on-write through the journaled swap); affected keys'
    intervals decompose back to events and rebuild, so late arrivals
    splice into history EXACTLY where a full replay puts them. The
    build is a pure function of the deduplicated event set —
    batch ≡ stream by construction — which is what the oracle
    replays: the one-shot window build over the whole feed, plus the
    per-batch bucket fan-out decomposition and the batch count.
    Buckets here are ``user_id % 8`` (uniform integer key) so the
    rewrite accounting is SQL-replayable; production string keys use
    the default xxhash64 bucketing."""
    import tempfile

    from dislib_spark.streaming.cdc import scd2_sink
    from dislib_spark.temporal import _epoch_seconds

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % 7 == 0
    )
    feed_rows = ev.select(
        "user_id",
        "event_type",
        _epoch_seconds(ev, "ts").alias("ts_s"),
        "event_id",
    )
    tmp = tempfile.mkdtemp(prefix="scd2_stream_")
    feed, ckpt, dim = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/dim"
    feed_rows.where(F.col("event_id") % 2 == 0).drop(
        "event_id"
    ).coalesce(1).write.mode("overwrite").parquet(feed)
    feed_rows.where(F.col("event_id") % 2 == 1).drop(
        "event_id"
    ).coalesce(1).write.mode("append").parquet(feed)
    counts: list[int] = []
    q = scd2_sink(
        spark.readStream.schema(
            "user_id long, event_type string, ts_s long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed),
        dim,
        ckpt,
        "user_id",
        ["event_type"],
        "ts_s",
        n_buckets=8,
        counts=counts,
        bucket_expr=F.pmod(F.col("user_id"), F.lit(8)),
        availableNow=True,
    )
    await_drain(q, 300)
    d = spark.read.parquet(dim)
    return (
        d.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.sum((F.col("valid_to") == 2**62).cast("long"))
            .cast("bigint")
            .alias("n_open"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("version").cast("bigint").alias("version_sum"),
        )
        .withColumn(
            "n_batches", F.lit(len(counts)).cast("bigint")
        )
        .withColumn(
            "n_bucket_rewrites", F.lit(sum(counts)).cast("bigint")
        )
        .orderBy("event_type")
    )


QUERIES = {
    "x01_rollup": x01_rollup,
    "x02_set_ops": x02_set_ops,
    "x03_json_extract": x03_json_extract,
    "x04_exists_subquery": x04_exists_subquery,
    "x05_group_percentiles": x05_group_percentiles,
    "x06_conditional_agg": x06_conditional_agg,
    "x07_range_join": x07_range_join,
    "x08_string_funcs": x08_string_funcs,
    "x09_date_arith": x09_date_arith,
    "x10_array_funcs": x10_array_funcs,
    "x11_pivot": x11_pivot,
    "x12_correlated_scalar": x12_correlated_scalar,
    "x13_asof_join": x13_asof_join,
    "x14_hll_distinct": x14_hll_distinct,
    "x15_funnel": x15_funnel,
    "x16_cohort": x16_cohort,
    "x17_bloom_semi_join": x17_bloom_semi_join,
    "x18_sql_interface": x18_sql_interface,
    "x19_ntile": x19_ntile,
    "x20_running_total": x20_running_total,
    "x21_tpch_q13": x21_tpch_q13,
    "x22_tpch_q21": x22_tpch_q21,
    "x23_tpch_q22": x23_tpch_q22,
    "x24_moving_avg": x24_moving_avg,
    "x41_histogram": x41_histogram,
    "x42_copurchase": x42_copurchase,
    "x43_latest_per_key": x43_latest_per_key,
    "x44_sketch_contract": x44_sketch_contract,
    "x45_time_rollup": x45_time_rollup,
    "x46_gapfill": x46_gapfill,
    "x47_incremental_rollup": x47_incremental_rollup,
    "x48_skew_profile": x48_skew_profile,
    "x49_zorder_cells": x49_zorder_cells,
    "x50_unpivot": x50_unpivot,
    "x51_merge_upsert": x51_merge_upsert,
    "x52_cube": x52_cube,
    "x53_table_profile": x53_table_profile,
    "x54_pruning_stats": x54_pruning_stats,
    "x55_share_report": x55_share_report,
    "x56_range_frame": x56_range_frame,
    "x57_null_semantics": x57_null_semantics,
    "x58_window_anomaly": x58_window_anomaly,
    "x59_grouping_sets": x59_grouping_sets,
    "x60_quality_checks": x60_quality_checks,
    "x61_sessionize": x61_sessionize,
    "x62_decay_score": x62_decay_score,
    "x63_twap": x63_twap,
    "x64_ohlc": x64_ohlc,
    "x65_scd2": x65_scd2,
    "x66_entity_resolution": x66_entity_resolution,
    "x67_markov_transitions": x67_markov_transitions,
    "x68_mom_growth": x68_mom_growth,
    "x69_gini": x69_gini,
    "x70_acf": x70_acf,
    "x71_cusum": x71_cusum,
    "x72_rsi": x72_rsi,
    "x73_dup_billing": x73_dup_billing,
    "x74_histogram_quantiles": x74_histogram_quantiles,
    "x75_funnel_attribution": x75_funnel_attribution,
    "x76_sampled_quantiles": x76_sampled_quantiles,
    "x77_freshness_audit": x77_freshness_audit,
    "x78_weekday_seasonality": x78_weekday_seasonality,
    "x79_abc_pareto": x79_abc_pareto,
    "x80_growth_accounting": x80_growth_accounting,
    "x81_session_funnel": x81_session_funnel,
    "x82_stride_quantiles": x82_stride_quantiles,
    "x83_attribution": x83_attribution,
    "x84_event_paths": x84_event_paths,
    "x85_session_entry_exit": x85_session_entry_exit,
    "x86_audience_overlap": x86_audience_overlap,
    "x87_dau_wau_stickiness": x87_dau_wau_stickiness,
    "x88_sketch_table": x88_sketch_table,
    "x89_k_core": x89_k_core,
    "x90_retention_triangle": x90_retention_triangle,
    "x91_position_attribution": x91_position_attribution,
    "x92_bucketed_join": x92_bucketed_join,
    "s01_tumbling": s01_tumbling,
    "s02_sessions": s02_sessions,
    "s03_dedup": s03_dedup,
    "s04_sliding": s04_sliding,
    "s05_interval_join": s05_interval_join,
    "s06_stream_static": s06_stream_static,
    "s07_rollup": s07_rollup,
    "s08_decayed_hitters": s08_decayed_hitters,
    "s09_stateful_running": s09_stateful_running,
    "s10_stream_join": s10_stream_join,
    "s11_stream_left_join": s11_stream_left_join,
    "s12_cdc_apply": s12_cdc_apply,
    "s13_stream_dedup_archive": s13_stream_dedup_archive,
    # round-7 continuation entries LAST: the registry reverses each
    # family, so the driver's sampled prefix sees the newest first
    "x93_max_concurrency": x93_max_concurrency,
    "x94_time_to_convert": x94_time_to_convert,
    "x95_header_line_reconciliation": x95_header_line_reconciliation,
    "x96_seasonal_decomposition": x96_seasonal_decomposition,
    "x97_sequence_pattern": x97_sequence_pattern,
    "s14_dedup_then_window": s14_dedup_then_window,
    "x98_experiment_readout": x98_experiment_readout,
    "x99_salted_agg": x99_salted_agg,
    # round-8 additions
    "x100_bitemporal_audit": x100_bitemporal_audit,
    "x101_hll_union_report": x101_hll_union_report,
    "x102_late_arrival_audit": x102_late_arrival_audit,
    "s15_stream_sessions": s15_stream_sessions,
    "x103_forgotten_users": x103_forgotten_users,
    "x104_snapshot_diff": x104_snapshot_diff,
    "x105_erasure_propagation": x105_erasure_propagation,
    "s16_streaming_erasure": s16_streaming_erasure,
    "x106_erasure_certificate": x106_erasure_certificate,
    "x107_retention_plan": x107_retention_plan,
    "x108_retention_execute": x108_retention_execute,
    "x109_retention_certificate": x109_retention_certificate,
    "x110_erasure_then_retention": x110_erasure_then_retention,
    "x111_retention_forecast": x111_retention_forecast,
    "s17_streaming_retention": s17_streaming_retention,
    "s18_streaming_scd2": s18_streaming_scd2,
}

ORACLE = {
    "x01_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ROUND(SUM(l_quantity), 6) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "x02_set_ops": """
        SELECT
            (SELECT COUNT(*) FROM (
                SELECT c_nationkey AS k FROM customer
                INTERSECT
                SELECT s_nationkey FROM supplier)) AS n_both,
            (SELECT COUNT(*) FROM (
                SELECT DISTINCT c_nationkey AS k FROM customer
                EXCEPT ALL
                SELECT DISTINCT s_nationkey FROM supplier)) AS n_only_customer
    """,
    "x03_json_extract": """
        SELECT k % 10 AS k_mod, COUNT(*) AS n, ROUND(AVG(k), 6) AS avg_k
        FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY k_mod ORDER BY k_mod
    """,
    "x04_exists_subquery": """
        SELECT c_mktsegment, COUNT(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "x05_group_percentiles": """
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS p50,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 6) AS p90
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "x06_conditional_agg": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS sum_f,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS sum_o,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS sum_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "x07_range_join": """
        SELECT bucket, COUNT(*) AS n,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_price
        FROM part
        JOIN (VALUES (0, 0.0, 500.0), (1, 500.0, 1000.0),
                     (2, 1000.0, 1500.0), (3, 1500.0, 1e9))
             AS b(bucket, lo, hi)
          ON p_retailprice >= lo AND p_retailprice < hi
        GROUP BY bucket ORDER BY bucket
    """,
    "x08_string_funcs": """
        SELECT has_one, COUNT(*) AS n, MIN(prefix) AS min_prefix,
               ROUND(AVG(name_len), 6) AS avg_len
        FROM (SELECT UPPER(SUBSTRING(c_name, 1, 8)) AS prefix,
                     CAST(LENGTH(c_name) AS INT) AS name_len,
                     c_name LIKE '%1%' AS has_one
              FROM customer)
        GROUP BY has_one ORDER BY has_one
    """,
    "x09_date_arith": """
        SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
               EXTRACT(QUARTER FROM o_orderdate) AS q,
               COUNT(*) AS n,
               COUNT(DISTINCT EXTRACT(DOW FROM o_orderdate)) AS n_dow
        FROM orders GROUP BY y, q ORDER BY y, q
    """,
    "x10_array_funcs": """
        SELECT vec_id,
               ROUND(list_max(embedding)::DOUBLE, 6) AS vmax,
               ROUND(list_min(embedding)::DOUBLE, 6) AS vmin,
               len(list_filter(embedding, v -> v > 0)) AS n_pos,
               ROUND(list_sum(list_transform(embedding, v -> v::DOUBLE)), 6) AS vsum
        FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
    """,
    "x11_pivot": """
        SELECT o_orderpriority,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "x12_correlated_scalar": """
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_big
        FROM orders o
        WHERE o_totalprice > 1.5 * (
            SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
    """,
    "x15_funnel": """
        WITH v AS (
            SELECT user_id, MIN(ts) AS v_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS c_ts
            FROM events e JOIN v ON e.user_id = v.user_id
                               AND e.ts > v.v_ts
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM events e JOIN c ON e.user_id = c.user_id
                               AND e.ts > c.c_ts
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_click,
               (SELECT COUNT(*) FROM p) AS n_purchase
    """,
    "x17_bloom_semi_join": """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "x44_sketch_contract": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS hll_ok,
               TRUE AS median_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "x43_latest_per_key": """
        SELECT user_id, event_id, event_type, value FROM (
            SELECT user_id, event_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn
            FROM events
        ) WHERE rn = 1 ORDER BY user_id
    """,
    "x42_copurchase": """
        WITH b AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS p1, c.l_partkey AS p2, COUNT(*) AS n
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY p1, p2 HAVING COUNT(*) >= 3
        ORDER BY n DESC, p1, p2
    """,
    "x41_histogram": """
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS INT) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total
        FROM orders GROUP BY bucket ORDER BY bucket
    """,
    "x18_sql_interface": _X18_SQL,
    "x21_tpch_q13": _X21_SQL,
    "x22_tpch_q21": _X22_SQL,
    "x23_tpch_q22": _X23_SQL,
    "x24_moving_avg": """
        SELECT o_custkey, o_orderkey,
               ROUND(AVG(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg3
        FROM orders WHERE o_custkey < 50
        ORDER BY o_custkey, o_orderkey
    """,
    "x19_ntile": """
        SELECT q, COUNT(*) AS n,
               ROUND(MIN(c_acctbal), 6) AS lo,
               ROUND(MAX(c_acctbal), 6) AS hi
        FROM (
            SELECT c_acctbal,
                   CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey)
                        AS INTEGER) AS q
            FROM customer
        ) GROUP BY q ORDER BY q
    """,
    "x20_running_total": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS run_total
        FROM orders WHERE o_custkey < 25
        ORDER BY o_custkey, o_orderkey
    """,
    "x16_cohort": """
        WITH f AS (
            SELECT user_id,
                   CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP)
                       AS cohort_w
            FROM events GROUP BY user_id
        ),
        a AS (
            SELECT DISTINCT user_id,
                   CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS aw
            FROM events
        )
        SELECT cohort_w,
               CAST(DATE_DIFF('day', cohort_w, aw) / 7 AS INTEGER)
                   AS week_offset,
               COUNT(*) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY cohort_w, week_offset
        ORDER BY cohort_w, week_offset
    """,
    "x13_asof_join": """
        SELECT click_id, user_id, view_id, view_value, gap_s FROM (
            SELECT c.event_id AS click_id, c.user_id AS user_id,
                   v.event_id AS view_id, v.value AS view_value,
                   CAST(date_diff('second', v.ts, c.ts) AS BIGINT)
                       AS gap_s,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.event_id
                       ORDER BY v.ts DESC, v.event_id DESC
                   ) AS rn
            FROM events c
            JOIN events v
              ON v.user_id = c.user_id AND v.ts <= c.ts
            WHERE c.event_type = 'click' AND v.event_type = 'view'
        ) WHERE rn = 1 ORDER BY click_id
    """,
    "s05_interval_join": """
        SELECT c.event_id AS click_id,
               COUNT(p.ts) AS n_purch,
               COALESCE(
                   CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE),
                   0.0
               ) AS sum_purch
        FROM events c
        LEFT JOIN events p
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase'
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click'
        GROUP BY c.event_id ORDER BY click_id
    """,
    "s06_stream_static": """
        SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w_start,
               c.c_mktsegment AS segment, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY w_start, segment
        ORDER BY w_start, segment
    """,
    "s01_tumbling": """
        SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w_start,
               CAST(DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS w_end,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY w_start, w_end, event_type
        ORDER BY w_start, event_type
    """,
    "s02_sessions": """
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sess AS (
            SELECT user_id,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered
        )
        SELECT COUNT(*) AS n_sessions,
               ROUND(AVG(n_events), 6) AS avg_events,
               MAX(n_events) AS max_events
        FROM (SELECT user_id, session_id, COUNT(*) AS n_events
              FROM sess GROUP BY user_id, session_id)
    """,
    "s03_dedup": """
        SELECT COUNT(DISTINCT event_id) AS n FROM events
    """,
    # each event belongs to the 4 epoch-aligned 15-min slide starts
    # covering it — identical to Spark's window('1 hour','15 minutes')
    "s04_sliding": """
        SELECT CAST(w_start AS TIMESTAMP) AS w_start, event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_value,
               COUNT(*) AS n
        FROM (
            SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                       - (k * INTERVAL 15 MINUTE) AS w_start,
                   event_type, value
            FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
        )
        GROUP BY w_start, event_type ORDER BY w_start, event_type
    """,
}

ORACLE["x45_time_rollup"] = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
"""

ORACLE["x46_gapfill"] = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('day', MIN(ts)) AS lo,
               date_trunc('day', MAX(ts)) AS hi
        FROM events
    ),
    days AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        FROM bounds
    ),
    spine AS (
        SELECT day, event_type
        FROM days CROSS JOIN (SELECT DISTINCT event_type FROM events)
    )
    SELECT s.day, s.event_type,
           COALESCE(d.n, 0) AS n,
           ROUND(COALESCE(
               LAST_VALUE(d.sum_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               0), 6) AS filled_value
    FROM spine s
    LEFT JOIN daily d ON s.day = d.day AND s.event_type = d.event_type
    ORDER BY s.day, s.event_type
"""

ORACLE["x47_incremental_rollup"] = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
"""

ORACLE["x48_skew_profile"] = """
    WITH kc AS (
        SELECT l_partkey, COUNT(*) AS n
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT n,
               ROW_NUMBER() OVER (ORDER BY n DESC, l_partkey) AS rk
        FROM kc
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_keys,
           ROUND(MAX(n)::DOUBLE / SUM(n), 6) AS max_share,
           ROUND(SUM(CASE WHEN rk <= 5 THEN n ELSE 0 END)::DOUBLE
                 / SUM(n), 6) AS topk_share,
           ROUND(MAX(n)::DOUBLE / AVG(n), 6) AS imbalance
    FROM ranked
"""

ORACLE["x49_zorder_cells"] = """
    WITH cells AS (
        SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem
    ),
    coded AS (
        SELECT x, y, ((((x // 1) % 2) * 1) + (((y // 1) % 2) * 2) + (((x // 2) % 2) * 4) + (((y // 2) % 2) * 8) + (((x // 4) % 2) * 16) + (((y // 4) % 2) * 32) + (((x // 8) % 2) * 64) + (((y // 8) % 2) * 128) + (((x // 16) % 2) * 256) + (((y // 16) % 2) * 512) + (((x // 32) % 2) * 1024) + (((y // 32) % 2) * 2048) + (((x // 64) % 2) * 4096) + (((y // 64) % 2) * 8192) + (((x // 128) % 2) * 16384) + (((y // 128) % 2) * 32768)) // 256 AS bucket
        FROM cells
    )
    SELECT bucket, COUNT(*) AS n,
           MAX(x) - MIN(x) AS x_span,
           MAX(y) - MIN(y) AS y_span
    FROM coded GROUP BY bucket ORDER BY bucket
"""

ORACLE["s07_rollup"] = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket, event_type
"""

ORACLE["x50_unpivot"] = """
    WITH wide AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               COUNT(*)::DOUBLE AS n_rows
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value FROM (
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM wide
        UNION ALL
        SELECT l_returnflag, 'n_rows', n_rows FROM wide
    ) ORDER BY l_returnflag, measure
"""

ORACLE["x51_merge_upsert"] = """
    WITH t AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    upd AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice
        FROM t WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT -o_orderkey, 'I', o_totalprice
        FROM t WHERE o_orderkey % 97 = 0
    ),
    del AS (SELECT o_orderkey FROM t WHERE o_orderkey % 100 = 50),
    kept AS (
        SELECT * FROM t
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
    ),
    merged AS (
        SELECT CASE WHEN u.o_orderkey IS NOT NULL
                    THEN u.o_orderstatus ELSE k.o_orderstatus END AS st,
               CASE WHEN u.o_orderkey IS NOT NULL
                    THEN u.o_totalprice ELSE k.o_totalprice END AS price
        FROM kept k FULL OUTER JOIN upd u ON k.o_orderkey = u.o_orderkey
    )
    SELECT st AS o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM merged GROUP BY st ORDER BY st
"""

ORACLE["x52_cube"] = """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
"""

ORACLE["x53_table_profile"] = """
    WITH p AS (
        SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
               COUNT(o_custkey) AS n_nonnull,
               COUNT(*) - COUNT(o_custkey) AS n_nulls,
               COUNT(DISTINCT o_custkey) AS n_distinct
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
               COUNT(*) - COUNT(o_orderstatus),
               COUNT(DISTINCT o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
               COUNT(*) - COUNT(o_orderpriority),
               COUNT(DISTINCT o_orderpriority)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate),
               COUNT(*) - COUNT(o_orderdate),
               COUNT(DISTINCT o_orderdate)
        FROM orders
    )
    SELECT * FROM p ORDER BY col_name
"""

ORACLE["x54_pruning_stats"] = """
    WITH li AS (
        SELECT l_orderkey, l_shipdate,
               CASE WHEN l_shipdate >= TIMESTAMP '1996-03-01'
                     AND l_shipdate <  TIMESTAMP '1996-06-01'
                    THEN 1 ELSE 0 END AS m
        FROM lineitem
    ),
    a AS (
        SELECT FLOOR(l_orderkey / 64) AS b,
               MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx,
               COUNT(*) AS n, SUM(m) AS nm
        FROM li GROUP BY 1
    ),
    b AS (
        SELECT DATE_TRUNC('month', l_shipdate) AS b,
               MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx,
               COUNT(*) AS n, SUM(m) AS nm
        FROM li GROUP BY 1
    ),
    s AS (
        SELECT 'orderkey_insertion' AS layout,
               COUNT(*) AS n_buckets,
               SUM(CASE WHEN mx < TIMESTAMP '1996-03-01'
                         OR mn >= TIMESTAMP '1996-06-01'
                        THEN 1 ELSE 0 END) AS n_pruned,
               SUM(CASE WHEN mx < TIMESTAMP '1996-03-01'
                         OR mn >= TIMESTAMP '1996-06-01'
                        THEN 0 ELSE n END) AS rows_scanned,
               SUM(nm) AS rows_matched
        FROM a
        UNION ALL
        SELECT 'shipdate_month', COUNT(*),
               SUM(CASE WHEN mx < TIMESTAMP '1996-03-01'
                         OR mn >= TIMESTAMP '1996-06-01'
                        THEN 1 ELSE 0 END),
               SUM(CASE WHEN mx < TIMESTAMP '1996-03-01'
                         OR mn >= TIMESTAMP '1996-06-01'
                        THEN 0 ELSE n END),
               SUM(nm)
        FROM b
    )
    SELECT layout, n_buckets::BIGINT AS n_buckets,
           n_pruned::BIGINT AS n_pruned,
           rows_scanned::BIGINT AS rows_scanned,
           rows_matched::BIGINT AS rows_matched,
           ROUND(rows_scanned::DOUBLE / rows_matched::DOUBLE, 4)
               AS read_amplification
    FROM s ORDER BY layout
"""

ORACLE["x55_share_report"] = """
    WITH per_nation AS (
        SELECT r.r_name, n.n_name, COUNT(*) AS n_orders,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name, n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE),
                 6) AS region_share,
           ROUND(CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS total_share,
           DENSE_RANK() OVER (
               PARTITION BY r_name ORDER BY rev DESC, n_name
           ) AS rank_in_region
    FROM per_nation
    ORDER BY r_name, rank_in_region, n_name
"""

ORACLE["s08_decayed_hitters"] = """
    WITH hc AS (
        SELECT user_id AS key, DATE_TRUNC('hour', ts) AS hour,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    ref AS (SELECT MAX(hour) AS ref_hour FROM hc)
    SELECT key, CAST(SUM(n) AS BIGINT) AS n_total,
           ROUND(SUM(n::DOUBLE * POWER(0.5,
               (EPOCH(ref_hour) - EPOCH(hour)) / 3600.0)), 6) AS score
    FROM hc, ref
    GROUP BY key
    ORDER BY score DESC, key
    LIMIT 20
"""

ORACLE["x56_range_frame"] = """
    WITH daily AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    d AS (
        SELECT event_type, day, n,
               DATEDIFF('day', DATE '1970-01-01', CAST(day AS DATE)) AS dayno
        FROM daily
    )
    SELECT event_type, day, n,
           CAST(SUM(n) OVER (
               PARTITION BY event_type ORDER BY dayno
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing7_n,
           ROUND(SUM(n) OVER (
               PARTITION BY event_type ORDER BY dayno
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           )::DOUBLE / COUNT(n) OVER (
               PARTITION BY event_type ORDER BY dayno
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS trailing7_daily_avg
    FROM d
    ORDER BY event_type, day
"""

ORACLE["x57_null_semantics"] = """
    WITH src AS (
        SELECT CASE WHEN k % 3 = 0 THEN NULL ELSE k % 5 END AS key
        FROM (
            SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
    ),
    g AS (SELECT key, COUNT(*) AS n FROM src GROUP BY key),
    dim(key, label) AS (VALUES
        (NULL, 'missing'), (1, 'one'), (2, 'two'),
        (3, 'three'), (4, 'four'))
    SELECT g.key, COALESCE(dim.label, '?') AS label, g.n
    FROM g LEFT JOIN dim ON g.key IS NOT DISTINCT FROM dim.key
    ORDER BY g.key NULLS LAST
"""

ORACLE["x58_window_anomaly"] = """
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    d AS (
        SELECT event_type, day, n,
               DATEDIFF('day', DATE '1970-01-01', day) AS dayno
        FROM daily
    ),
    scored AS (
        SELECT event_type, day, n,
               COUNT(n) OVER w AS cnt,
               SUM(n) OVER w AS s,
               SUM(n * n) OVER w AS q
        FROM d
        WINDOW w AS (
            PARTITION BY event_type ORDER BY dayno
            RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING
        )
    ),
    z AS (
        SELECT event_type, day,
               CASE WHEN cnt >= 2
                     AND (q::DOUBLE - s::DOUBLE * s::DOUBLE / cnt::DOUBLE)
                         / (cnt::DOUBLE - 1) > 0
                    THEN (n::DOUBLE - s::DOUBLE / cnt::DOUBLE)
                         / SQRT((q::DOUBLE - s::DOUBLE * s::DOUBLE
                                 / cnt::DOUBLE) / (cnt::DOUBLE - 1))
               END AS z
        FROM scored
    )
    SELECT event_type, COUNT(*) AS n_days, COUNT(z) AS n_scored,
           CAST(SUM(CASE WHEN ABS(z) > 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_anomalies,
           ROUND(MAX(ABS(z)), 4) AS max_abs_z
    FROM z GROUP BY event_type ORDER BY event_type
"""

ORACLE["x59_grouping_sets"] = _X59_SQL

ORACLE["x60_quality_checks"] = """
    WITH base AS (
        SELECT COUNT(*) AS n,
               COUNT(DISTINCT o_orderkey) AS n_keys,
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                   AS n_bad_price,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                   AS n_null_cust
        FROM orders
    ),
    orph AS (
        SELECT COUNT(*) AS n_orphans FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
        )
    ),
    checks AS (
        SELECT 'pk_unique_o_orderkey' AS chk, n, n - n_keys AS v
        FROM base
        UNION ALL
        SELECT 'fk_orders_customer_orphans', base.n, orph.n_orphans
        FROM base, orph
        UNION ALL
        SELECT 'range_o_totalprice_positive', n, n_bad_price FROM base
        UNION ALL
        SELECT 'nonnull_o_custkey', n, n_null_cust FROM base
    )
    SELECT chk AS check, n::BIGINT AS n_rows, v::BIGINT AS n_violations,
           v = 0 AS passed
    FROM checks ORDER BY chk
"""

ORACLE["s09_stateful_running"] = """
    SELECT user_id,
           COUNT(*) AS n,
           ROUND(SUM(value), 6) AS total,
           MAX(value) AS vmax
    FROM events
    GROUP BY user_id
    ORDER BY user_id
"""

# x61: the flag/cumsum replay orders by (whole second, event_id) —
# identical to the Spark side's (micro-ts, event_id) for session
# purposes because the gap test only sees whole seconds: same-second
# clusters keep their membership under any intra-cluster order, so
# flags, cumsums and per-session aggregates agree exactly.
ORACLE["x61_sessionize"] = """
    WITH e AS (
        SELECT user_id, event_id, value, ts,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec
        FROM events WHERE user_id < 50
    ),
    flg AS (
        SELECT *,
               CASE WHEN LAG(sec) OVER w IS NULL
                         OR sec - LAG(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
        SELECT *,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flg
    )
    SELECT user_id, session_id,
           CAST(date_trunc('second', MIN(ts)) AS TIMESTAMP)
               AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spend,
           MAX(sec) - MIN(sec) AS duration_s
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
"""

# x62: LN(2) is hardcoded to its nearest-double so both engines feed
# EXP the identical argument; the per-term DECIMAL(28,12) cast makes
# the sum order-exact and the final ROUND(,6) absorbs any last-ulp
# EXP difference between libm implementations.
ORACLE["x62_decay_score"] = """
    SELECT user_id,
           ROUND(CAST(SUM(CAST(
               value * EXP((1706745600
                            - CAST(EPOCH(date_trunc('second', ts))
                                   AS BIGINT))
                           / -604800.0 * 0.6931471805599453)
               AS DECIMAL(28,12))) AS DOUBLE), 6) AS decayed_spend,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY user_id
"""

# x63: dt weights are exact integers; value*dt is one IEEE multiply
# (identical bits both engines) cast to DECIMAL(28,6) so the weighted
# sum is order-exact; DuckDB's HUGEINT window/group sums cast back to
# BIGINT to match Spark's long.
ORACLE["x63_twap"] = """
    WITH e AS (
        SELECT user_id, date_trunc('day', ts) AS bucket,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec,
               event_id, value
        FROM events
    ),
    w AS (
        SELECT *, LEAD(sec) OVER (
                   PARTITION BY user_id, bucket
                   ORDER BY sec, event_id) - sec AS dt
        FROM e
    )
    SELECT user_id, CAST(bucket AS TIMESTAMP) AS bucket,
           ROUND(CAST(SUM(CAST(value * dt AS DECIMAL(28,6))) AS DOUBLE)
                 / CAST(SUM(dt) AS BIGINT), 6) AS twap,
           CAST(SUM(dt) AS BIGINT) AS span_s,
           COUNT(*) AS n_obs
    FROM w WHERE dt > 0
    GROUP BY user_id, bucket
    ORDER BY user_id, bucket
"""

# x64: open/close replayed with first/last row_number picks over the
# (sec, event_id) order — exactly the struct-MIN/MAX lexicographic
# pick because (sec, event_id) is unique.
ORACLE["x64_ohlc"] = """
    WITH e AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec,
               event_id, value
        FROM events
    ),
    w AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                  ORDER BY sec, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                  ORDER BY sec DESC, event_id DESC) AS rn_d
        FROM e
    )
    SELECT event_type, CAST(bucket AS TIMESTAMP) AS bucket,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           MAX(value) AS high,
           MIN(value) AS low,
           COUNT(*) AS n_obs,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS volume
    FROM w
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
"""
# (x64 oracle accumulates volume at DECIMAL(28,6), matching the
# engine's ohlc_bars grain — parity survives a generator emitting
# finer-than-2dp values.)

# x65: interval bounds are exact integer seconds; version numbering
# rides the same (sec, event_id) total order on both engines; the
# probe instants are pinned epoch ints (no timestamp-string parsing).
ORACLE["x65_scd2"] = """
    WITH dim AS (
        SELECT user_id, event_type,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT)
                   AS valid_from,
               COALESCE(LEAD(CAST(EPOCH(date_trunc('second', ts))
                                  AS BIGINT)) OVER w,
                        4611686018427387904) AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INT) AS version
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY CAST(EPOCH(date_trunc('second', ts)) AS BIGINT),
                     event_id)
    ),
    probes AS (
        SELECT 1704844800 + k * 864000 AS probe_s
        FROM UNNEST([0, 1, 2]) AS t(k)
    ),
    counts AS (
        SELECT user_id, COUNT(*) AS n_versions FROM dim GROUP BY user_id
    )
    SELECT probe_s, d.user_id, event_type, version, n_versions
    FROM dim d
    JOIN probes p ON d.valid_from <= p.probe_s AND p.probe_s < d.valid_to
    JOIN counts c ON c.user_id = d.user_id
    WHERE d.user_id < 40
    ORDER BY probe_s, d.user_id
"""

# x66: levenshtein is exact integer DP on both engines; sims round to
# 9dp before the weighted sum (fixed field order, left-assoc) and the
# final score/display round to 6 — the filter applies to the ROUNDED
# score on both sides.
ORACLE["x66_entity_resolution"] = """
    WITH side AS (
        SELECT * FROM (
            SELECT c_custkey, c_name, c_acctbal, c_nationkey,
                   c_mktsegment,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey, c_mktsegment
                       ORDER BY c_custkey) AS bn
            FROM customer
        ) WHERE bn <= 40
    ),
    pairs AS (
        SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
               1.0 - levenshtein(a.c_name, b.c_name)
                     / CAST(GREATEST(LENGTH(a.c_name),
                                     LENGTH(b.c_name)) AS DOUBLE)
                   AS s_name,
               1.0 - LEAST(ABS(a.c_acctbal - b.c_acctbal) / 2000.0, 1.0)
                   AS s_bal
        FROM side a JOIN side b
          ON a.c_custkey < b.c_custkey
         AND a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
    ),
    scored AS (
        SELECT a_id, b_id,
               ROUND(s_name, 6) AS sim_name,
               ROUND(s_bal, 6) AS sim_acctbal,
               ROUND(0.0 + ROUND(s_name, 9) * 0.6
                         + ROUND(s_bal, 9) * 0.4, 6) AS score
        FROM pairs
    )
    SELECT * FROM scored WHERE score >= 0.5
    ORDER BY score DESC, a_id, b_id LIMIT 30
"""

# x67: transition counts are exact integers; each probability is one
# IEEE-exact division of a count by its row total.
ORACLE["x67_markov_transitions"] = """
    WITH p AS (
        SELECT event_type AS prev_state,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_state
        FROM events
    ),
    c AS (
        SELECT prev_state, next_state, COUNT(*) AS n
        FROM p WHERE next_state IS NOT NULL
        GROUP BY prev_state, next_state
    )
    SELECT prev_state, next_state, CAST(n AS BIGINT) AS n,
           ROUND(n::DOUBLE / SUM(n) OVER (PARTITION BY prev_state), 6)
               AS prob
    FROM c ORDER BY prev_state, next_state
"""

# x68: DATE_TRUNC('month') yields DATE in DuckDB but TIMESTAMP in
# Spark -> cast; revenue sums stay DECIMAL(18,2) until the divide.
ORACLE["x68_mom_growth"] = """
    WITH monthly AS (
        SELECT r.r_name,
               CAST(DATE_TRUNC('month', o.o_orderdate) AS TIMESTAMP)
                   AS month,
               COUNT(*) AS n_orders,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, DATE_TRUNC('month', o.o_orderdate)
    )
    SELECT r_name, month, CAST(n_orders AS BIGINT) AS n_orders,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND((CAST(rev AS DOUBLE)
                  - CAST(LAG(rev) OVER w AS DOUBLE))
                 / CAST(LAG(rev) OVER w AS DOUBLE), 6) AS mom_growth
    FROM monthly
    WINDOW w AS (PARTITION BY r_name ORDER BY month)
    ORDER BY r_name, month
"""

# x69: the rank*revenue cross-moment is summed as exact DECIMAL(38,2)
# on both engines (a double sum tops 2^53), cast to double only for
# the final scalar Gini algebra.
ORACLE["x69_gini"] = """
    WITH per_cust AS (
        SELECT r.r_name, c.c_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, c.c_custkey
    ),
    ranked AS (
        SELECT r_name, rev,
               ROW_NUMBER() OVER (
                   PARTITION BY r_name ORDER BY rev, c_custkey
               ) AS i
        FROM per_cust
    ),
    g AS (
        SELECT r_name, COUNT(*) AS n_cust,
               SUM(rev) AS tot,
               SUM(CAST(i * rev AS DECIMAL(38,2))) AS s1
        FROM ranked GROUP BY r_name
    )
    SELECT r_name, CAST(n_cust AS BIGINT) AS n_cust,
           CAST(tot AS DOUBLE) AS revenue,
           ROUND(2.0 * CAST(s1 AS DOUBLE)
                     / (n_cust * CAST(tot AS DOUBLE))
                 - (n_cust + 1) / CAST(n_cust AS DOUBLE), 6) AS gini
    FROM g ORDER BY r_name
"""

# x70: deviations rounded to 4 dp and carried as DECIMAL(18,4), so
# numerator and denominator sums are exact on both engines; mu is one
# IEEE division of the exact decimal total.
ORACLE["x70_acf"] = """
    WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS m,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY DATE_TRUNC('month', o_orderdate)
    ),
    st AS (
        SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mu FROM monthly
    ),
    dev AS (
        SELECT ROW_NUMBER() OVER (ORDER BY m) AS i,
               CAST(ROUND(CAST(rev AS DOUBLE) - mu, 4)
                    AS DECIMAL(18,4)) AS d
        FROM monthly, st
    ),
    den AS (
        SELECT SUM(CAST(d AS DECIMAL(19,4)) * d) AS dd FROM dev
    ),
    ks AS (SELECT UNNEST(range(1, 13)) AS k),
    num AS (
        SELECT ks.k, COUNT(*) AS n_pairs,
               SUM(CAST(a.d AS DECIMAL(19,4)) * b.d) AS num
        FROM ks, dev a, dev b
        WHERE b.i = a.i + ks.k
        GROUP BY ks.k
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n_pairs AS BIGINT) AS n_pairs,
           ROUND(CAST(num AS DOUBLE) / CAST(dd AS DOUBLE), 6) AS acf_k
    FROM num, den ORDER BY k
"""

# x71: S_t = exact-decimal prefix sum minus t*mu — one IEEE
# product/subtract per row, no float accumulation.
ORACLE["x71_cusum"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events GROUP BY date_trunc('day', ts)
    ),
    st AS (
        SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mu FROM daily
    ),
    r AS (
        SELECT day AS t, CAST(v AS DOUBLE) AS x,
               CAST(SUM(v) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE)
               - ROW_NUMBER() OVER (ORDER BY day) * mu AS s
        FROM daily, st
    )
    SELECT t, x, ROUND(s, 6) AS s_t FROM r ORDER BY t
"""

# x72: deltas and trailing sums are exact decimals; the only float op
# is the final ratio. All-gain windows pin RSI to exactly 100.
ORACLE["x72_rsi"] = """
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events GROUP BY date_trunc('day', ts)
    ),
    d AS (
        SELECT day AS t, CAST(v AS DOUBLE) AS x,
               CAST(v - LAG(v) OVER w AS DECIMAL(38,6)) AS del,
               ROW_NUMBER() OVER w AS i
        FROM daily WINDOW w AS (ORDER BY day)
    ),
    gl AS (
        SELECT t, x, i,
               SUM(CASE WHEN del > 0 THEN del
                        ELSE CAST(0 AS DECIMAL(38,6)) END)
                   OVER w7 AS gs,
               SUM(CASE WHEN del < 0 THEN -del
                        ELSE CAST(0 AS DECIMAL(38,6)) END)
                   OVER w7 AS ls
        FROM d
        WINDOW w7 AS (ORDER BY t ROWS BETWEEN 6 PRECEDING
                      AND CURRENT ROW)
    )
    SELECT t, x,
           ROUND(CASE WHEN ls = 0 THEN 100.0
                      ELSE 100.0 - 100.0
                           / (1.0 + CAST(gs AS DOUBLE)
                                    / CAST(ls AS DOUBLE))
                 END, 6) AS rsi
    FROM gl WHERE i > 7 ORDER BY t
"""

# x73: exact integer day gaps; the (gap, cust, k1, k2) ordering is
# total so the LIMIT is deterministic.
ORACLE["x73_dup_billing"] = """
    WITH o AS (
        SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS d,
               CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS bucket
        FROM orders
    ),
    r AS (
        SELECT o_custkey, bucket,
               LAG(o_orderkey) OVER w AS k1, o_orderkey AS k2,
               LAG(d) OVER w AS d1, d AS d2
        FROM o
        WINDOW w AS (PARTITION BY o_custkey, bucket
                     ORDER BY d, o_orderkey)
    )
    SELECT o_custkey, bucket, k1, k2,
           CAST(d2 - d1 AS BIGINT) AS gap_days
    FROM r
    WHERE k1 IS NOT NULL AND d2 - d1 <= 30
    ORDER BY gap_days, o_custkey, k1, k2 LIMIT 50
"""


# x74: the histogram bin key (v-lo)/width uses identical IEEE double
# ops on both engines (bit-equal bucket ids); ranks/counts are exact
# integers and the interpolation is written in the same operation
# order as the Spark expression.
ORACLE["x74_histogram_quantiles"] = """
    WITH b AS (
        SELECT MIN(CAST(l_extendedprice AS DOUBLE)) AS lo,
               MAX(CAST(l_extendedprice AS DOUBLE)) AS hi
        FROM lineitem
    ),
    h AS (
        SELECT l_returnflag,
               CAST(CASE WHEN (SELECT hi FROM b) = (SELECT lo FROM b)
                         THEN 0
                         ELSE LEAST(127, FLOOR(
                             (CAST(l_extendedprice AS DOUBLE)
                              - (SELECT lo FROM b))
                             / (((SELECT hi FROM b) - (SELECT lo FROM b))
                                / 128.0)))
                    END AS INT) AS bin,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, bin, CAST(cnt AS BIGINT) AS cnt,
               CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - cnt AS BIGINT) AS cum_prev,
               CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT)
                   AS n
        FROM h
    ),
    qt AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q),
    hit AS (
        SELECT l_returnflag, q, bin, cnt, cum_prev,
               CAST(CEIL(CAST(q AS DOUBLE) * n) AS BIGINT) AS r
        FROM c CROSS JOIN qt
        WHERE cum >= CEIL(CAST(q AS DOUBLE) * n)
          AND cum_prev < CEIL(CAST(q AS DOUBLE) * n)
    )
    SELECT l_returnflag, CAST(q AS DOUBLE) AS q,
           ROUND((SELECT lo FROM b)
                 + (bin + (r - cum_prev)::DOUBLE / cnt::DOUBLE)
                   * (((SELECT hi FROM b) - (SELECT lo FROM b)) / 128.0),
                 6) AS est
    FROM hit ORDER BY l_returnflag, q
"""

# x75: whole-second lag arithmetic on tz-free epochs; the per-purchase
# MAX and the day rollup are exact-integer aggregations.
ORACLE["x75_funnel_attribution"] = """
    WITH e AS (
        SELECT event_id, user_id, event_type,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec,
               CAST(ts AS DATE) AS day
        FROM events
    ),
    p AS (
        SELECT event_id, user_id, sec, day FROM e
        WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, sec AS csec FROM e WHERE event_type = 'click'
    ),
    per AS (
        SELECT p.event_id, p.day, ANY_VALUE(p.sec) AS to_sec,
               MAX(CASE WHEN c.csec < p.sec AND p.sec - c.csec <= 3600
                        THEN c.csec END) AS from_sec
        FROM p LEFT JOIN c ON c.user_id = p.user_id
        GROUP BY p.event_id, p.day
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN from_sec IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_attributed,
           ROUND(AVG(to_sec - from_sec), 6) AS avg_lag_s
    FROM per GROUP BY day ORDER BY day
"""


# x77: all exact-integer outputs; the epoch math replays the NTZ
# recipe (EPOCH of second-truncated ts) used across the temporal
# oracles.
ORACLE["x77_freshness_audit"] = """
    WITH e AS (
        SELECT event_type,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec
        FROM events
    ),
    wm AS (SELECT MAX(sec) AS w FROM e)
    SELECT event_type,
           COUNT(*) AS n_events,
           MAX(sec) AS last_sec,
           (SELECT w FROM wm) - MAX(sec) AS staleness_s,
           CAST(SUM(CASE WHEN sec > (SELECT w FROM wm) - 604800
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_last7d,
           CAST(SUM(CASE WHEN sec <= (SELECT w FROM wm) - 604800
                     AND sec > (SELECT w FROM wm) - 1209600
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_prior7d
    FROM e
    GROUP BY event_type
    ORDER BY event_type
"""


# x76: the md5 keep-decision replays via the '0x'||substr conv recipe;
# QUANTILE_CONT == Spark percentile (linear interpolation, x05
# precedent); n_sample witnesses exact sample membership.
ORACLE["x76_sampled_quantiles"] = """
    WITH s AS (
        SELECT l_returnflag, l_extendedprice
        FROM lineitem
        WHERE CAST(('0x' || substr(md5(
                  concat_ws('|', l_orderkey, l_linenumber)), 1, 4))
              AS INTEGER) % 10000 < 500
    )
    SELECT l_returnflag,
           COUNT(*) AS n_sample,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS p50,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 6) AS p90,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 6) AS p99
    FROM s
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


# s10: whole-second truncation makes the 1-hour boundary and lag
# exact integers; hour bucket replays the x64 NTZ recipe.
ORACLE["s10_stream_join"] = """
    WITH e AS (
        SELECT user_id, event_type, date_trunc('second', ts) AS s
        FROM events
    ),
    c AS (SELECT user_id, s AS c_ts FROM e WHERE event_type = 'click'),
    p AS (SELECT user_id, s AS p_ts FROM e WHERE event_type = 'purchase'),
    j AS (
        SELECT c.user_id, c_ts, p_ts,
               CAST(EPOCH(p_ts) AS BIGINT)
               - CAST(EPOCH(c_ts) AS BIGINT) AS lag_s
        FROM c JOIN p
          ON c.user_id = p.user_id
         AND p_ts > c_ts
         AND p_ts <= c_ts + INTERVAL 1 HOUR
    )
    SELECT CAST(date_trunc('hour', p_ts) AS TIMESTAMP) AS hour,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(AVG(lag_s), 6) AS avg_lag_s
    FROM j
    GROUP BY date_trunc('hour', p_ts)
    ORDER BY hour
"""


# x78: DuckDB dayofweek(=0-6 Sunday=0? use DAYOFWEEK) differs from
# Spark's 1-7 (Sunday=1); replay Spark's convention explicitly.
ORACLE["x78_weekday_seasonality"] = """
    WITH g AS (
        SELECT CAST(dayofweek(ts) AS INTEGER) + 1 AS dow,
               CAST(hour(ts) AS INTEGER) AS hod,
               COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events
        GROUP BY 1, 2
    )
    SELECT dow, hod, n,
           CAST(v AS DOUBLE) AS sum_value,
           ROUND(n::DOUBLE / (SUM(n) OVER (PARTITION BY dow))::DOUBLE, 6)
               AS dow_share
    FROM g
    ORDER BY dow, hod
"""


# x79: DECIMAL cumulative sums are order-exact, the ABC boundary is an
# exact decimal compare (cum*10 <= tot*7), shares divide doubles cast
# from exact decimals.
ORACLE["x79_abc_pareto"] = """
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    r AS (
        SELECT rev,
               SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum,
               SUM(rev) OVER () AS tot
        FROM rev
    )
    SELECT CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                WHEN cum * 10 <= tot * 9 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE), 6)
               AS share
    FROM r
    GROUP BY 1
    ORDER BY abc_class
"""


# x80: week buckets replay via DATE_TRUNC (cast AS TIMESTAMP — x16's
# recipe); status classes and churn anti-join are exact set logic.
ORACLE["x80_growth_accounting"] = """
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS w
        FROM events
    ),
    c AS (
        SELECT w,
               CASE
                 WHEN w = MIN(w) OVER (PARTITION BY user_id) THEN 'new'
                 WHEN LAG(w) OVER (PARTITION BY user_id ORDER BY w)
                      = w - INTERVAL 7 DAY THEN 'retained'
                 ELSE 'resurrected'
               END AS status
        FROM uw
    ),
    base AS (
        SELECT w, status, COUNT(*) AS n_users
        FROM c GROUP BY w, status
    ),
    churn AS (
        SELECT n.w, 'churned' AS status, COUNT(*) AS n_users
        FROM (SELECT user_id, w + INTERVAL 7 DAY AS w FROM uw) n
        LEFT JOIN uw x ON n.user_id = x.user_id AND n.w = x.w
        WHERE x.user_id IS NULL
          AND n.w <= (SELECT MAX(w) FROM uw)
        GROUP BY n.w
    )
    SELECT w, status, n_users FROM base
    UNION ALL
    SELECT w, status, n_users FROM churn
    ORDER BY w, status
"""

# x81: x61's second-quantized session assignment (all users) feeding
# the x15 staged-min funnel, session-scoped; raw-ts stage comparisons
# are safe (fixture timestamps are exactly microsecond-grained on
# both engines).
ORACLE["x81_session_funnel"] = """
    WITH e AS (
        SELECT user_id, event_id, event_type, ts,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec
        FROM events
    ),
    flg AS (
        SELECT *,
               CASE WHEN LAG(sec) OVER w IS NULL
                         OR sec - LAG(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, ts,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flg
    ),
    base AS (
        SELECT user_id, session_id FROM sess GROUP BY 1, 2
    ),
    v AS (
        SELECT user_id, session_id, MIN(ts) AS v_ts
        FROM sess WHERE event_type = 'view' GROUP BY 1, 2
    ),
    c AS (
        SELECT s.user_id, s.session_id, MIN(s.ts) AS c_ts
        FROM sess s
        JOIN v ON s.user_id = v.user_id AND s.session_id = v.session_id
        WHERE s.event_type = 'click' AND s.ts > v.v_ts
        GROUP BY 1, 2
    ),
    p AS (
        SELECT s.user_id, s.session_id, MIN(s.ts) AS p_ts
        FROM sess s
        JOIN c ON s.user_id = c.user_id AND s.session_id = c.session_id
        WHERE s.event_type = 'purchase' AND s.ts > c.c_ts
        GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_sessions,
           COUNT(v.v_ts) AS n_view,
           COUNT(c.c_ts) AS n_click,
           COUNT(p.p_ts) AS n_purchase,
           ROUND(COUNT(p.p_ts)
                 / CAST(NULLIF(COUNT(v.v_ts), 0) AS DOUBLE), 6)
               AS conv_rate
    FROM base b
    LEFT JOIN v ON b.user_id = v.user_id AND b.session_id = v.session_id
    LEFT JOIN c ON b.user_id = c.user_id AND b.session_id = c.session_id
    LEFT JOIN p ON b.user_id = p.user_id AND b.session_id = p.session_id
"""

# x82: full integer replay — md5 shard, ⌈m/k⌉ stride via integer
# division, block-min/weight selection, running weighted rank, and
# the ceil(q·n) target (q cast DOUBLE so both engines multiply the
# same IEEE literals).
ORACLE["x82_stride_quantiles"] = """
    WITH src AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS val,
               CONCAT(l_orderkey, '|', l_linenumber) AS kstr
        FROM lineitem
    ),
    sh AS (
        SELECT val, kstr,
               CAST('0x' || substr(md5(kstr), 1, 4) AS INTEGER) % 32
                   AS shard
        FROM src
    ),
    st AS (
        SELECT shard, val, kstr,
               ROW_NUMBER() OVER (
                   PARTITION BY shard ORDER BY val, kstr) AS rn,
               COUNT(*) OVER (PARTITION BY shard) AS m
        FROM sh
    ),
    st2 AS (SELECT *, (m + 255) // 256 AS stride FROM st),
    kept AS (
        SELECT shard, val, kstr, stride,
               LEAST(stride, m - (rn - 1)) AS wt
        FROM st2 WHERE (rn - 1) % stride = 0
    ),
    tot AS (
        SELECT CAST(SUM(wt) AS BIGINT) AS n,
               COUNT(*) AS summary_rows
        FROM kept
    ),
    bnd AS (
        SELECT CAST(SUM(stride - 1) AS BIGINT) AS rank_err_bound
        FROM (SELECT shard, MAX(stride) AS stride
              FROM kept GROUP BY shard)
    ),
    cum AS (
        SELECT val,
               CAST(SUM(wt) OVER (ORDER BY val, kstr
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
        FROM kept
    ),
    qs AS (SELECT CAST(UNNEST([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
    SELECT q, ROUND(MIN(val), 6) AS est, n, summary_rows,
           rank_err_bound
    FROM cum CROSS JOIN tot CROSS JOIN bnd CROSS JOIN qs
    WHERE cumw >= CAST(CEIL(q * n) AS BIGINT)
    GROUP BY q, n, summary_rows, rank_err_bound
    ORDER BY q
"""

# s11: the batch face of the left-outer interval join — DuckDB
# replays the ON-clause range join and the click-level accounting.
ORACLE["s11_stream_left_join"] = """
    WITH c AS (
        SELECT user_id, event_id,
               date_trunc('second', ts) AS c_ts
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id, date_trunc('second', ts) AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT c.user_id, c.event_id, c.c_ts, p.p_ts
        FROM c LEFT JOIN p
          ON c.user_id = p.user_id
         AND p.p_ts > c.c_ts
         AND p.p_ts <= c.c_ts + INTERVAL 1 HOUR
    )
    SELECT CAST(date_trunc('hour', c_ts) AS TIMESTAMP) AS hour,
           COUNT(*) AS n_rows,
           COUNT(p_ts) AS n_matched,
           COUNT(DISTINCT event_id) AS n_clicks,
           COUNT(DISTINCT CASE WHEN p_ts IS NULL THEN event_id END)
               AS n_unmatched_clicks,
           ROUND(COUNT(DISTINCT CASE WHEN p_ts IS NOT NULL
                                     THEN event_id END)
                 / CAST(COUNT(DISTINCT event_id) AS DOUBLE), 6)
               AS match_rate
    FROM j GROUP BY 1 ORDER BY hour
"""

ORACLE["x83_attribution"] = """
    WITH ch AS (
        -- ((k % 4) + 4) % 4 replays Spark's F.pmod (non-negative)
        -- even on negative k; NULL-k clicks are dropped both sides
        SELECT user_id, event_id AS c_id, ts AS c_ts,
               'ch' || (((CAST(json_extract_string(props, '$.k')
                               AS BIGINT) % 4) + 4) % 4) AS channel
        FROM events WHERE event_type = 'click'
          AND CAST(json_extract_string(props, '$.k') AS BIGINT)
              IS NOT NULL
    ),
    b AS (
        SELECT user_id, event_id AS p_id, ts AS p_ts,
               CAST(value AS DECIMAL(18,2)) AS val
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT b.p_id, b.val, c.channel, c.c_ts, c.c_id
        FROM b JOIN ch c
          ON b.user_id = c.user_id
         AND c.c_ts < b.p_ts
         AND c.c_ts >= b.p_ts - INTERVAL 7 DAY
    ),
    f AS (
        SELECT channel, val FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY p_id ORDER BY c_ts, c_id) AS rn
            FROM j
        ) WHERE rn = 1
    ),
    l AS (
        SELECT channel, val FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY p_id ORDER BY c_ts DESC, c_id DESC) AS rn
            FROM j
        ) WHERE rn = 1
    ),
    fa AS (
        SELECT channel, COUNT(*) AS n_first,
               CAST(SUM(val) AS DOUBLE) AS rev_first
        FROM f GROUP BY channel
    ),
    la AS (
        SELECT channel, COUNT(*) AS n_last,
               CAST(SUM(val) AS DOUBLE) AS rev_last
        FROM l GROUP BY channel
    )
    SELECT COALESCE(fa.channel, la.channel) AS channel,
           COALESCE(fa.n_first, 0) AS n_first,
           COALESCE(fa.rev_first, 0.0) AS rev_first,
           COALESCE(la.n_last, 0) AS n_last,
           COALESCE(la.rev_last, 0.0) AS rev_last
    FROM fa FULL OUTER JOIN la ON fa.channel = la.channel
    ORDER BY channel
"""

# x84: the x61 session CTE feeding two LEADs; top-10 on exact counts.
ORACLE["x84_event_paths"] = """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec
        FROM events
    ),
    flg AS (
        SELECT *,
               CASE WHEN LAG(sec) OVER w IS NULL
                         OR sec - LAG(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, event_type, sec,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flg
    ),
    tri AS (
        SELECT event_type,
               LEAD(event_type, 1) OVER w AS e2,
               LEAD(event_type, 2) OVER w AS e3
        FROM sess
        WINDOW w AS (PARTITION BY user_id, session_id
                     ORDER BY sec, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           COUNT(*) AS n
    FROM tri WHERE e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
"""

# x85: the x61 session CTE; entry/exit replayed as rank-1 picks over
# the same (sec, event_id) total order min_by/max_by uses.
ORACLE["x85_session_entry_exit"] = """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS sec
        FROM events
    ),
    flg AS (
        SELECT *,
               CASE WHEN LAG(sec) OVER w IS NULL
                         OR sec - LAG(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sess AS (
        SELECT user_id, event_type, sec, event_id,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flg
    ),
    rk AS (
        SELECT user_id, session_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, session_id
                   ORDER BY sec, event_id) AS rf,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, session_id
                   ORDER BY sec DESC, event_id DESC) AS rl,
               COUNT(*) OVER (
                   PARTITION BY user_id, session_id) AS n
        FROM sess
    ),
    per AS (
        SELECT user_id, session_id,
               MAX(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
               MAX(CASE WHEN rl = 1 THEN event_type END) AS exit_type,
               CAST(MAX(n) AS BIGINT) AS n_events
        FROM rk GROUP BY 1, 2
    )
    SELECT entry_type, exit_type,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces
    FROM per
    GROUP BY 1, 2
    ORDER BY entry_type, exit_type
"""

ORACLE["x86_audience_overlap"] = """
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS w
        FROM events
    ),
    per AS (SELECT w, COUNT(*) AS n_users FROM uw GROUP BY w),
    inter AS (
        SELECT n.w, COUNT(*) AS n_retained
        FROM (SELECT user_id, w + INTERVAL 7 DAY AS w FROM uw) n
        JOIN uw x ON n.user_id = x.user_id AND n.w = x.w
        GROUP BY n.w
    ),
    prev AS (
        SELECT w + INTERVAL 7 DAY AS w, n_users AS n_prev FROM per
    )
    SELECT p.w, pr.n_prev, p.n_users AS n_curr,
           COALESCE(i.n_retained, 0) AS n_retained,
           p.n_users - COALESCE(i.n_retained, 0) AS n_new,
           pr.n_prev - COALESCE(i.n_retained, 0) AS n_lost,
           ROUND(COALESCE(i.n_retained, 0)
                 / CAST(pr.n_prev + p.n_users
                        - COALESCE(i.n_retained, 0) AS DOUBLE), 6)
               AS jaccard
    FROM per p
    JOIN prev pr ON p.w = pr.w
    LEFT JOIN inter i ON p.w = i.w
    ORDER BY p.w
"""

ORACLE["x87_dau_wau_stickiness"] = """
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        FROM events
    ),
    dau AS (SELECT d, COUNT(*) AS n_dau FROM ud GROUP BY d),
    win AS (
        SELECT DISTINCT user_id, d + i * INTERVAL 1 DAY AS wd
        FROM ud, UNNEST([0, 1, 2, 3, 4, 5, 6]) AS t(i)
    ),
    wau AS (SELECT wd, COUNT(*) AS n_wau FROM win GROUP BY wd)
    SELECT CAST(dau.d AS TIMESTAMP) AS d, dau.n_dau, wau.n_wau,
           ROUND(dau.n_dau / CAST(wau.n_wau AS DOUBLE), 6)
               AS stickiness
    FROM dau JOIN wau ON dau.d = wau.wd
    ORDER BY d
"""

# s12: full merge replay — latest-per-key compaction with the exact
# compact_changes tie order (ts, then remaining columns in frame
# order, all DESC), then the update/insert/delete arms as set algebra.
ORACLE["s12_cdc_apply"] = """
    WITH base AS (
        SELECT c_custkey, c_nationkey, c_acctbal AS acctbal,
               TIMESTAMP '1990-01-01 00:00:00' AS ts, 'I' AS op
        FROM customer
    ),
    ch AS (
        SELECT o.o_custkey AS c_custkey, c.c_nationkey,
               o.o_totalprice AS acctbal,
               CAST(o.o_orderdate AS TIMESTAMP) AS ts,
               CASE WHEN o.o_custkey % 50 = 0 THEN 'D' ELSE 'U' END
                   AS op
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    latest AS (
        SELECT c_custkey, c_nationkey, acctbal, ts, op FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_custkey
                ORDER BY ts DESC, c_nationkey DESC, acctbal DESC,
                         op DESC) AS rn
            FROM ch
        ) WHERE rn = 1
    ),
    upds AS (SELECT * FROM latest WHERE op <> 'D'),
    dels AS (SELECT c_custkey FROM latest WHERE op = 'D'),
    merged AS (
        SELECT b.c_nationkey, b.acctbal FROM base b
        WHERE b.c_custkey NOT IN (SELECT c_custkey FROM dels)
          AND b.c_custkey NOT IN (SELECT c_custkey FROM upds)
        UNION ALL
        SELECT c_nationkey, acctbal FROM upds
    )
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_balance
    FROM merged
    GROUP BY c_nationkey
    ORDER BY c_nationkey
"""


def _x89_oracle(k: int = 2, rounds: int = 6) -> str:
    """Unrolled-CTE replay of graph.k_core's fixed-round peel (the
    t21 pattern): each level filters vertices by HAVING COUNT >= k,
    then keeps edges with both endpoints surviving."""
    parts = [
        """
    WITH d AS (
        SELECT doc_id, SUBSTRING(text, 1, 80) AS pfx,
               md5(array_to_string(
                   list_slice(string_split(text, ' '), 1, 2), ' ')) AS bk
        FROM documents
    ),
    p AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM d a JOIN d b ON a.bk = b.bk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.pfx, b.pfx) <= 60
    ),
    e0 AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p)"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
    v{i} AS (SELECT u FROM e{i} GROUP BY u HAVING COUNT(*) >= {k}),
    e{i + 1} AS (
        SELECT e.u, e.v FROM e{i} e
        WHERE e.u IN (SELECT u FROM v{i})
          AND e.v IN (SELECT u FROM v{i})
    )"""
        )
    parts.append(
        f"""
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
    FROM e{rounds} GROUP BY u ORDER BY node"""
    )
    return "".join(parts)


ORACLE["x89_k_core"] = _x89_oracle()

# x90: a_i counts are exact ints; DuckDB's BIGINT '/' is float
# division like Spark's — the per-offset rates replay to the ulp and
# the NULL observability mask uses the identical datediff horizon.
ORACLE["x90_retention_triangle"] = """
    WITH f AS (
        SELECT user_id,
               CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP)
                   AS cohort_w
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS aw
        FROM events
    ),
    j AS (
        SELECT cohort_w,
               CAST(DATE_DIFF('day', cohort_w, aw) / 7 AS INTEGER)
                   AS off
        FROM a JOIN f USING (user_id)
    ),
    base AS (
        SELECT cohort_w,
               SUM(CASE WHEN off = 0 THEN 1 ELSE 0 END)::BIGINT AS a0,
               SUM(CASE WHEN off = 1 THEN 1 ELSE 0 END)::BIGINT AS a1,
               SUM(CASE WHEN off = 2 THEN 1 ELSE 0 END)::BIGINT AS a2,
               SUM(CASE WHEN off = 3 THEN 1 ELSE 0 END)::BIGINT AS a3,
               SUM(CASE WHEN off = 4 THEN 1 ELSE 0 END)::BIGINT AS a4,
               SUM(CASE WHEN off = 5 THEN 1 ELSE 0 END)::BIGINT AS a5,
               SUM(CASE WHEN off = 6 THEN 1 ELSE 0 END)::BIGINT AS a6,
               SUM(CASE WHEN off = 7 THEN 1 ELSE 0 END)::BIGINT AS a7
        FROM j GROUP BY cohort_w
    ),
    mx AS (
        SELECT CAST(DATE_TRUNC('week', MAX(ts)) AS TIMESTAMP)
                   AS max_w
        FROM events
    )
    SELECT cohort_w, a0 AS cohort_size,
           CASE WHEN 1 > CAST(DATE_DIFF('day', cohort_w, max_w) / 7
                              AS INTEGER)
                THEN NULL ELSE ROUND(a1 / a0, 6) END AS r1,
           CASE WHEN 2 > CAST(DATE_DIFF('day', cohort_w, max_w) / 7
                              AS INTEGER)
                THEN NULL ELSE ROUND(a2 / a0, 6) END AS r2,
           CASE WHEN 3 > CAST(DATE_DIFF('day', cohort_w, max_w) / 7
                              AS INTEGER)
                THEN NULL ELSE ROUND(a3 / a0, 6) END AS r3,
           CASE WHEN 4 > CAST(DATE_DIFF('day', cohort_w, max_w) / 7
                              AS INTEGER)
                THEN NULL ELSE ROUND(a4 / a0, 6) END AS r4,
           CASE WHEN 5 > CAST(DATE_DIFF('day', cohort_w, max_w) / 7
                              AS INTEGER)
                THEN NULL ELSE ROUND(a5 / a0, 6) END AS r5,
           CASE WHEN 6 > CAST(DATE_DIFF('day', cohort_w, max_w) / 7
                              AS INTEGER)
                THEN NULL ELSE ROUND(a6 / a0, 6) END AS r6,
           CASE WHEN 7 > CAST(DATE_DIFF('day', cohort_w, max_w) / 7
                              AS INTEGER)
                THEN NULL ELSE ROUND(a7 / a0, 6) END AS r7
    FROM base CROSS JOIN mx
    ORDER BY cohort_w
"""

# x88: the x82 stride-sketch replay on the finer (month, shard)
# partition; parquet persistence is a value no-op for double/long
# columns so the oracle skips it.
ORACLE["x88_sketch_table"] = """
    WITH src AS (
        SELECT STRFTIME(DATE_TRUNC('month', l_shipdate), '%Y-%m-%d')
                   AS part,
               CAST(l_extendedprice AS DOUBLE) AS val,
               CONCAT(l_orderkey, '|', l_linenumber) AS kstr
        FROM lineitem
    ),
    sh AS (
        SELECT part, val, kstr,
               CAST('0x' || substr(md5(kstr), 1, 4) AS INTEGER) % 4
                   AS shard
        FROM src
    ),
    st AS (
        SELECT part, shard, val, kstr,
               ROW_NUMBER() OVER (
                   PARTITION BY part, shard ORDER BY val, kstr) AS rn,
               COUNT(*) OVER (PARTITION BY part, shard) AS m
        FROM sh
    ),
    st2 AS (SELECT *, (m + 63) // 64 AS stride FROM st),
    kept AS (
        SELECT part, shard, val, kstr, stride,
               LEAST(stride, m - (rn - 1)) AS wt
        FROM st2 WHERE (rn - 1) % stride = 0
    ),
    tot AS (
        SELECT CAST(SUM(wt) AS BIGINT) AS n,
               COUNT(*) AS summary_rows
        FROM kept
    ),
    bnd AS (
        SELECT CAST(SUM(stride - 1) AS BIGINT) AS rank_err_bound
        FROM (SELECT part, shard, MAX(stride) AS stride
              FROM kept GROUP BY part, shard)
    ),
    cum AS (
        SELECT val,
               CAST(SUM(wt) OVER (ORDER BY val, kstr
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
        FROM kept
    ),
    qs AS (SELECT CAST(UNNEST([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
    SELECT q, ROUND(MIN(val), 6) AS est, n, summary_rows,
           rank_err_bound
    FROM cum CROSS JOIN tot CROSS JOIN bnd CROSS JOIN qs
    WHERE cumw >= CAST(CEIL(q * n) AS BIGINT)
    GROUP BY q, n, summary_rows, rank_err_bound
    ORDER BY q
"""


def _s13_oracle() -> str:
    """DuckDB replay of s13's md5-mode index probe — the t05 recipe
    (shared minhash_perms constants, md5-prefix shingle hashes, md5
    band keys) with candidates restricted to new (odd) × archive
    (even); the parquet round-trip of the index is a value no-op."""
    from dislib_spark.text.dedup import _MERSENNE as M, minhash_perms

    sig_items = ",\n               ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {M}))"
        for a, b in minhash_perms(32, seed=7)
    )
    band_structs = ",\n                   ".join(
        "{'bi': %d, 'bh': md5(concat_ws(',', %s))}"
        % (
            b,
            ", ".join(
                f"CAST(sig[{b * 4 + j + 1}] AS VARCHAR)" for j in range(4)
            ),
        )
        for b in range(8)
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([concat_ws(' ', toks[i], toks[i+1],
                                        toks[i+2])
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t
    ),
    hashed AS (
        SELECT doc_id, sh,
               list_transform(sh, s ->
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
                   % {M}) AS hs
        FROM sh WHERE len(sh) > 0
    ),
    sig AS (
        SELECT doc_id, sh,
               [{sig_items}] AS sig
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, u.bi AS band_idx, u.bh AS band_hash FROM (
            SELECT doc_id,
                   UNNEST([{band_structs}]) AS u
            FROM sig
        )
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS index_id
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
    ),
    scored AS (
        SELECT c.new_id, c.index_id,
               ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE
                     / (len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh)))::DOUBLE,
                     6) AS jaccard
        FROM cand c
        JOIN sig x ON x.doc_id = c.new_id
        JOIN sig y ON y.doc_id = c.index_id
    )
    SELECT new_id, index_id, jaccard FROM scored
    WHERE jaccard >= 0.3 ORDER BY new_id, index_id
    """


ORACLE["s13_stream_dedup_archive"] = _s13_oracle()

# x91: the x83 join/rank shape with U-shaped weights; 6-dp rounding
# sits >=6 orders above the double-sum ulp so the per-channel credit
# is summation-order-proof.
ORACLE["x91_position_attribution"] = """
    WITH ch AS (
        SELECT user_id, event_id AS c_id, ts AS c_ts,
               'ch' || (((CAST(json_extract_string(props, '$.k')
                               AS BIGINT) % 4) + 4) % 4) AS channel
        FROM events WHERE event_type = 'click'
          AND CAST(json_extract_string(props, '$.k') AS BIGINT)
              IS NOT NULL
    ),
    b AS (
        SELECT user_id, event_id AS p_id, ts AS p_ts,
               CAST(value AS DECIMAL(18,2)) AS val
        FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT b.p_id, b.val, c.channel, c.c_ts, c.c_id
        FROM b JOIN ch c
          ON b.user_id = c.user_id
         AND c.c_ts < b.p_ts
         AND c.c_ts >= b.p_ts - INTERVAL 7 DAY
    ),
    t AS (
        SELECT p_id, channel, val,
               ROW_NUMBER() OVER (
                   PARTITION BY p_id ORDER BY c_ts, c_id) AS rn,
               COUNT(*) OVER (PARTITION BY p_id) AS nt
        FROM j
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(CAST(val AS DOUBLE)
                 * CASE WHEN nt = 1 THEN 1.0
                        WHEN nt = 2 THEN 0.5
                        WHEN rn = 1 OR rn = nt THEN 0.4
                        ELSE 0.2 / (CAST(nt AS DOUBLE) - 2.0)
                   END), 6) AS credited_rev
    FROM t GROUP BY channel ORDER BY channel
"""

# x92: bucketed layout is a value no-op — plain join + rollup; money
# math per-term DECIMAL (the x25 recipe).
ORACLE["x92_bucketed_join"] = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(28,4))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""

# x93: integer-microsecond endpoints, per-type windowed prefix sum
# (the engine's single global prefix sum telescopes to the same
# values), end-before-start tie order pinned by d ascending.
ORACLE["x93_max_concurrency"] = """
    WITH pts AS (
        SELECT event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t,
               CAST(1 AS BIGINT) AS d
        FROM events
        UNION ALL
        SELECT event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
               + CAST(FLOOR(value * 60000000.0) AS BIGINT) AS t,
               CAST(-1 AS BIGINT) AS d
        FROM events
    ),
    cum AS (
        SELECT event_type, t, d,
               SUM(d) OVER (PARTITION BY event_type
                            ORDER BY t, d, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS conc
        FROM pts
    ),
    pk AS (
        SELECT event_type,
               CAST(COUNT(*) / 2 AS BIGINT) AS n_events,
               MAX(conc) AS peak
        FROM cum GROUP BY event_type
    )
    SELECT cum.event_type,
           MAX(pk.n_events) AS n_events,
           CAST(MAX(pk.peak) AS BIGINT) AS peak_concurrency,
           MIN(cum.t) AS first_peak_t_us
    FROM cum JOIN pk
      ON cum.event_type = pk.event_type AND cum.conc = pk.peak
    GROUP BY cum.event_type
    ORDER BY cum.event_type
"""

# x94: exact integer-microsecond latency, FLOOR-pinned day buckets
# (DuckDB CAST(double AS BIGINT) rounds where Spark truncates, so
# both sides floor explicitly); shares over the full viewer base.
ORACLE["x94_time_to_convert"] = """
    WITH v AS (
        SELECT user_id,
               MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS mv
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    b AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT b.user_id,
               CAST(FLOOR((MIN(b.t) - MAX(v.mv)) / 1000000.0)
                    AS BIGINT) AS lat_s
        FROM b JOIN v ON b.user_id = v.user_id
        WHERE b.t > v.mv
        GROUP BY b.user_id
    ),
    bucketed AS (
        SELECT CASE WHEN c.lat_s IS NOT NULL
                    THEN LEAST(CAST(FLOOR(c.lat_s / 86400.0)
                                    AS BIGINT), 7)
               END AS conv_day,
               c.lat_s
        FROM v LEFT JOIN c ON v.user_id = c.user_id
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM bucketed)
    SELECT conv_day,
           COUNT(*) AS n_users,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(MAX(tot.n_total) AS DOUBLE), 6) AS share,
           ROUND(CAST(SUM(lat_s) AS DOUBLE) / COUNT(lat_s), 6)
               AS avg_latency_s
    FROM bucketed CROSS JOIN tot
    GROUP BY conv_day
    ORDER BY conv_day
"""

# x95: exact-decimal line rollup, double gap algebra mirrored; avg
# over NULL gaps (orphan headers) excluded by AVG on both engines.
ORACLE["x95_header_line_reconciliation"] = """
    WITH lines AS (
        SELECT l_orderkey AS ok,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS line_sum
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderpriority, o.o_totalprice,
               CAST(l.line_sum AS DOUBLE) AS ls
        FROM orders o LEFT JOIN lines l ON o.o_orderkey = l.ok
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN ls IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphan_headers,
           ROUND(AVG(ABS(o_totalprice - ls) / o_totalprice), 6)
               AS avg_rel_gap,
           ROUND(AVG(CASE WHEN ABS(o_totalprice - ls) / o_totalprice
                               <= 0.5
                          THEN 1.0 ELSE 0.0 END), 6)
               AS frac_within_50pct
    FROM j
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


# s14: dedup of identical redelivered rows == DISTINCT on the tripled
# projection; hour windows replayed as date_trunc, s01's convention.
ORACLE["s14_dedup_then_window"] = """
    WITH dd AS (
        SELECT DISTINCT event_id, ts, event_type FROM (
            SELECT event_id, ts, event_type FROM events
            UNION ALL
            SELECT event_id, ts, event_type FROM events
        )
    )
    SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS w_start,
           CAST(DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR
                AS TIMESTAMP) AS w_end,
           event_type, COUNT(*) AS n
    FROM dd
    GROUP BY w_start, w_end, event_type
    ORDER BY w_start, event_type
"""

# x96: monthly exact-decimal rollup, the even-window centered MA
# written in the same left-associative order, NULL-edge months
# skipped by AVG on both engines.
ORACLE["x96_seasonal_decomposition"] = """
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS rev
        FROM orders GROUP BY 1
    ),
    t AS (
        SELECT mon, rev,
               (LAG(rev, 6) OVER w / 2.0
                + LAG(rev, 5) OVER w
                + LAG(rev, 4) OVER w
                + LAG(rev, 3) OVER w
                + LAG(rev, 2) OVER w
                + LAG(rev, 1) OVER w
                + rev
                + LEAD(rev, 1) OVER w
                + LEAD(rev, 2) OVER w
                + LEAD(rev, 3) OVER w
                + LEAD(rev, 4) OVER w
                + LEAD(rev, 5) OVER w
                + LEAD(rev, 6) OVER w / 2.0) / 12.0 AS trend
        FROM m WINDOW w AS (ORDER BY mon)
    )
    SELECT CAST(MONTH(mon) AS BIGINT) AS month,
           COUNT(*) AS n_months,
           ROUND(AVG(rev / trend), 6) AS seasonal_index,
           ROUND(AVG(rev), 6) AS avg_revenue
    FROM t
    GROUP BY 1 ORDER BY 1
"""

# x97: path string via ORDER BY string_agg (the engine's
# array_sort(struct) replay); regexes identical RE2-safe patterns.
ORACLE["x97_sequence_pattern"] = """
    WITH sess AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               STRING_AGG(SUBSTR(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS path
        FROM events
        GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN regexp_matches(path, 'v.*c.*p')
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_browse_to_buy,
           CAST(SUM(CASE WHEN regexp_matches(path, 'vcp')
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_strict_vcp,
           CAST(SUM(CASE WHEN regexp_matches(path, 'c.*e.*p')
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_error_interrupted,
           CAST(SUM(CASE WHEN LENGTH(path) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
           ROUND(AVG(CAST(LENGTH(path) AS DOUBLE)), 6)
               AS avg_session_len
    FROM sess
"""


# x98: the sampling.hash_bucket md5 parity replayed verbatim; per-
# user conversion flags and the pooled-z algebra mirrored.
ORACLE["x98_experiment_readout"] = """
    WITH pu AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS converted,
               CASE WHEN CAST('0x' || substr(
                              md5(CAST(user_id AS VARCHAR)), 1, 4)
                          AS INTEGER) % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm
        FROM events
        GROUP BY user_id
    ),
    g AS (
        SELECT arm, COUNT(*) AS n_users,
               SUM(converted) AS n_converted
        FROM pu GROUP BY arm
    ),
    w AS (
        SELECT SUM(CASE WHEN arm = 'control' THEN n_users END) AS nc,
               SUM(CASE WHEN arm = 'control' THEN n_converted END)
                   AS xc,
               SUM(CASE WHEN arm = 'treatment' THEN n_users END)
                   AS nt,
               SUM(CASE WHEN arm = 'treatment' THEN n_converted END)
                   AS xt
        FROM g
    )
    SELECT CAST(nc AS BIGINT) AS n_control,
           CAST(xc AS BIGINT) AS conv_control,
           CAST(nt AS BIGINT) AS n_treatment,
           CAST(xt AS BIGINT) AS conv_treatment,
           ROUND(CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE), 6)
               AS rate_control,
           ROUND(CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE), 6)
               AS rate_treatment,
           CASE WHEN (CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                     / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)) > 0
                 AND (CAST(xc AS DOUBLE) + CAST(xt AS DOUBLE))
                     / (CAST(nc AS DOUBLE) + CAST(nt AS DOUBLE)) < 1
                THEN ROUND((CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
                            - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE))
                           / SQRT(((CAST(xc AS DOUBLE)
                                    + CAST(xt AS DOUBLE))
                                   / (CAST(nc AS DOUBLE)
                                      + CAST(nt AS DOUBLE)))
                                  * (1.0 - (CAST(xc AS DOUBLE)
                                            + CAST(xt AS DOUBLE))
                                           / (CAST(nc AS DOUBLE)
                                              + CAST(nt AS DOUBLE)))
                                  * (1.0 / CAST(nc AS DOUBLE)
                                     + 1.0 / CAST(nt AS DOUBLE))), 6)
           END AS z
    FROM w
"""


# x99: the oracle is the UNSALTED rollup — salting must be a value
# no-op; n_salt_cells replays the distinct-salt count per key.
ORACLE["x99_salted_agg"] = """
    WITH partial AS (
        SELECT l_returnflag,
               CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                                   1, 4) AS INTEGER) % 16 AS salt,
               COUNT(*) AS pn,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS prev
        FROM lineitem
        GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(SUM(pn) AS BIGINT) AS n_items,
           CAST(SUM(prev) AS DOUBLE) AS revenue,
           COUNT(*) AS n_salt_cells
    FROM partial
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

# x100: two SCD2 builds (with/without the late feed), the x65 probe
# join against both, exact integer fold.
ORACLE["x100_bitemporal_audit"] = """
    WITH sec AS (
        SELECT user_id, event_id, event_type,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS s
        FROM events
    ),
    dim_c AS (
        SELECT user_id, event_type, s AS vf,
               COALESCE(LEAD(s) OVER w, 4611686018427387904) AS vt
        FROM sec
        WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
    ),
    dim_i AS (
        SELECT user_id, event_type, s AS vf,
               COALESCE(LEAD(s) OVER w, 4611686018427387904) AS vt
        FROM sec WHERE event_id % 7 <> 0
        WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
    ),
    probes AS (
        SELECT CAST(1704844800 + k * 864000 AS BIGINT) AS probe_s
        FROM UNNEST([0, 1, 2]) AS t(k)
    ),
    ac AS (
        SELECT probe_s, user_id, event_type AS et_c
        FROM dim_c JOIN probes ON vf <= probe_s AND probe_s < vt
    ),
    ai AS (
        SELECT probe_s, user_id, event_type AS et_i
        FROM dim_i JOIN probes ON vf <= probe_s AND probe_s < vt
    )
    SELECT probe_s,
           CAST(COUNT(*) AS BIGINT) AS n_visible_corrected,
           CAST(SUM(CASE WHEN et_i IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_visible_initial,
           CAST(SUM(CASE WHEN et_i IS NOT NULL AND et_i <> et_c
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_answer_changed,
           CAST(SUM(CASE WHEN et_i IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_newly_visible
    FROM ac LEFT JOIN ai USING (probe_s, user_id)
    GROUP BY probe_s ORDER BY probe_s
"""

# x102: strict-predecessor running max over arrival order (the
# global window is oracle-side only — the engine uses the
# distributed prefix-max primitive); NULL first-row lateness never
# counts on either engine.
ORACLE["x102_late_arrival_audit"] = """
    WITH t AS (
        SELECT event_id,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS t
        FROM events
    ),
    r AS (
        SELECT t, MAX(t) OVER (ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pm
        FROM t
    ),
    l AS (SELECT pm - t AS late FROM r),
    w AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS d0,
               SUM(CASE WHEN late > 60 THEN 1 ELSE 0 END) AS d60,
               SUM(CASE WHEN late > 300 THEN 1 ELSE 0 END) AS d300,
               SUM(CASE WHEN late > 3600 THEN 1 ELSE 0 END) AS d3600,
               MAX(late) AS mx
        FROM l
    )
    SELECT watermark_delay_s, n_dropped,
           ROUND(CAST(n_dropped AS DOUBLE) / n, 6) AS drop_share,
           CAST(mx AS BIGINT) AS max_late_s
    FROM (
        SELECT CAST(0 AS INTEGER) AS watermark_delay_s,
               CAST(d0 AS BIGINT) AS n_dropped, n, mx FROM w
        UNION ALL
        SELECT 60, CAST(d60 AS BIGINT), n, mx FROM w
        UNION ALL
        SELECT 300, CAST(d300 AS BIGINT), n, mx FROM w
        UNION ALL
        SELECT 3600, CAST(d3600 AS BIGINT), n, mx FROM w
    )
    ORDER BY watermark_delay_s
"""

# s15: gaps-and-islands replay of the timeout sessionizer (ties at
# the same second share a session whatever the lag order, so the
# tiebreak-free window is deterministic here).
ORACLE["s15_stream_sessions"] = """
    WITH s AS (
        SELECT user_id,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS t
        FROM events
    ),
    o AS (
        SELECT user_id, t,
               CASE WHEN LAG(t) OVER w IS NULL
                         OR t - LAG(t) OVER w > 900
                    THEN 1 ELSE 0 END AS brk
        FROM s WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    g AS (
        SELECT user_id,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    ),
    sess AS (
        SELECT user_id, sid, COUNT(*) AS n_events
        FROM g GROUP BY user_id, sid
    )
    SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM sess GROUP BY n_events ORDER BY n_events
"""


def _x101_oracle() -> str:
    """DuckDB replay of the md5-HLL register pipeline: identical
    64-bit register/rank derivation (exact string arithmetic on the
    16 md5 hex chars after the register byte), identical
    Python-computed alpha*m^2 constant, identical small-range
    correction branch; the parquet round-trip of the partials is a
    value no-op. The `wh || '0'` pad keeps the nibble cast total
    (the lz=16 branch never reads it)."""
    m = 256
    amm = 0.7213 / (1.0 + 1.079 / m) * m * m
    return f"""
    WITH h AS (
        SELECT event_type AS scope,
               md5(CAST(user_id AS VARCHAR)) AS h
        FROM events
    ),
    reg AS (
        SELECT scope,
               CAST(('0x' || substr(h, 1, 2)) AS INTEGER) AS reg,
               substr(h, 3, 16) AS wh
        FROM h
    ),
    rho AS (
        SELECT scope, reg,
               CASE WHEN lz = 16 THEN 65
                    ELSE lz * 4
                         + CASE WHEN nib >= 8 THEN 0
                                WHEN nib >= 4 THEN 1
                                WHEN nib >= 2 THEN 2
                                ELSE 3 END
                         + 1
               END AS rho
        FROM (
            SELECT scope, reg, lz,
                   CAST(('0x' || substr(wh || '0', lz + 1, 1))
                        AS INTEGER) AS nib
            FROM (
                SELECT scope, reg, wh,
                       len(regexp_extract(wh, '^0*')) AS lz
                FROM reg
            )
        )
    ),
    partials AS (
        SELECT scope, reg, MAX(rho) AS max_rho
        FROM rho GROUP BY scope, reg
    ),
    all_regs AS (
        SELECT 'all' AS k, reg, MAX(max_rho) AS max_rho
        FROM partials GROUP BY reg
    ),
    est_scope AS (
        SELECT scope,
               SUM(POW(2.0, -max_rho)) AS s,
               COUNT(*) AS nz
        FROM partials GROUP BY scope
    ),
    est_all AS (
        SELECT '__all__' AS scope,
               SUM(POW(2.0, -max_rho)) AS s,
               COUNT(*) AS nz
        FROM all_regs
    ),
    est AS (
        SELECT scope,
               ROUND(CASE WHEN {amm!r} / (s + ({m} - nz)) <= {2.5 * m!r}
                               AND nz < {m}
                          THEN {float(m)!r}
                               * LN({float(m)!r}
                                    / CAST({m} - nz AS DOUBLE))
                          ELSE {amm!r} / (s + ({m} - nz))
                     END, 6) AS hll_estimate,
               CAST(nz AS BIGINT) AS n_nonzero_regs
        FROM (SELECT * FROM est_scope UNION ALL SELECT * FROM est_all)
    ),
    exact AS (
        SELECT event_type AS scope,
               COUNT(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '__all__', COUNT(DISTINCT user_id) FROM events
    )
    SELECT e.scope,
           CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
           e.hll_estimate,
           ROUND(ABS(e.hll_estimate
                     - CAST(x.exact_distinct AS DOUBLE))
                 / x.exact_distinct, 6) AS rel_err,
           e.n_nonzero_regs
    FROM est e JOIN exact x ON e.scope = x.scope
    ORDER BY e.scope
    """


ORACLE["x101_hll_union_report"] = _x101_oracle()

# x103: the erasure replayed logically — before/after per type,
# erased-user cardinality, residual 0 by construction, partition
# fan-out of the erased keys; the copy-on-write rewrite is a value
# no-op.
ORACLE["x103_forgotten_users"] = """
    WITH erased AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ),
    before AS (
        SELECT event_type, COUNT(*) AS n_before
        FROM events GROUP BY event_type
    ),
    after AS (
        SELECT event_type, COUNT(*) AS n_after
        FROM events
        WHERE user_id NOT IN (SELECT user_id FROM erased)
        GROUP BY event_type
    ),
    t AS (SELECT COUNT(*) AS n_users_erased FROM erased),
    p AS (
        SELECT COUNT(DISTINCT strftime(date_trunc('day', ts),
                                       '%Y-%m-%d'))
                   AS n_parts
        FROM events
        WHERE user_id IN (SELECT user_id FROM erased)
    )
    SELECT b.event_type,
           CAST(b.n_before AS BIGINT) AS n_before,
           CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
           CAST(b.n_before - COALESCE(a.n_after, 0) AS BIGINT)
               AS n_erased,
           CAST(t.n_users_erased AS BIGINT) AS n_users_erased,
           CAST(0 AS BIGINT) AS n_residual_rows,
           CAST(p.n_parts AS BIGINT) AS n_parts_rewritten
    FROM before b LEFT JOIN after a ON b.event_type = a.event_type,
         t, p
    ORDER BY b.event_type
"""

# x105: the erasure + incremental rollup repair replayed logically —
# before-rollup over all events, after-rollup over the non-erased
# rows; the incremental repair is a value no-op versus recompute
# (that IS the property the Spark side checks, so n_stale_groups is
# the literal 0 the audit must produce); value sums DECIMAL-exact.
ORACLE["x105_erasure_propagation"] = """
    WITH erased AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ),
    b AS (
        SELECT event_type, COUNT(*) AS rows_before,
               SUM(CAST(value AS DECIMAL(18,2))) AS val_before
        FROM events GROUP BY event_type
    ),
    a AS (
        SELECT event_type, COUNT(*) AS rows_after,
               SUM(CAST(value AS DECIMAL(18,2))) AS val_after
        FROM events
        WHERE user_id NOT IN (SELECT user_id FROM erased)
        GROUP BY event_type
    ),
    d AS (
        SELECT COUNT(DISTINCT strftime(date_trunc('day', ts),
                                       '%Y-%m-%d')) AS n_days
        FROM events
        WHERE user_id IN (SELECT user_id FROM erased)
    )
    SELECT b.event_type,
           CAST(b.rows_before AS BIGINT) AS rows_before,
           CAST(COALESCE(a.rows_after, 0) AS BIGINT) AS rows_after,
           CAST(b.rows_before - COALESCE(a.rows_after, 0) AS BIGINT)
               AS rows_forgotten,
           ROUND(CAST(b.val_before - COALESCE(a.val_after, 0)
                      AS DOUBLE), 6) AS value_forgotten,
           CAST(0 AS BIGINT) AS n_stale_groups,
           CAST(d.n_days AS BIGINT) AS n_days_repaired
    FROM b LEFT JOIN a ON b.event_type = a.event_type, d
    ORDER BY b.event_type
"""

# s16: the streamed two-round erasure is idempotent and batch-
# associative, so the logical one-shot erase replays it; the total
# rewritten-partition count is round 1's day fan-out plus round 2's
# (round 1 removes only round-1 users' rows, so round-2 users' day
# memberships are unchanged when batch 2 lands).
ORACLE["s16_streaming_erasure"] = """
    WITH erased AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ),
    before AS (
        SELECT event_type, COUNT(*) AS n_before
        FROM events GROUP BY event_type
    ),
    after AS (
        SELECT event_type, COUNT(*) AS n_after
        FROM events
        WHERE user_id NOT IN (SELECT user_id FROM erased)
        GROUP BY event_type
    ),
    t AS (SELECT COUNT(*) AS n_users_erased FROM erased),
    p1 AS (
        SELECT COUNT(DISTINCT strftime(date_trunc('day', ts),
                                       '%Y-%m-%d')) AS n
        FROM events WHERE user_id % 194 = 0
    ),
    p2 AS (
        SELECT COUNT(DISTINCT strftime(date_trunc('day', ts),
                                       '%Y-%m-%d')) AS n
        FROM events WHERE user_id % 97 = 0 AND user_id % 194 <> 0
    )
    SELECT b.event_type,
           CAST(b.n_before AS BIGINT) AS n_before,
           CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
           CAST(b.n_before - COALESCE(a.n_after, 0) AS BIGINT)
               AS n_erased,
           CAST(t.n_users_erased AS BIGINT) AS n_users_erased,
           CAST(0 AS BIGINT) AS n_residual_rows,
           CAST(p1.n + p2.n AS BIGINT) AS n_parts_rewritten_total
    FROM before b LEFT JOIN after a ON b.event_type = a.event_type,
         t, p1, p2
    ORDER BY b.event_type
"""

# x106: the per-user certificate replayed logically — pre-erase
# grouped stats per erased user, residual 0 by construction; the
# storage mechanics are value no-ops.
ORACLE["x106_erasure_certificate"] = """
    WITH e AS (
        SELECT user_id,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
        FROM events WHERE user_id % 97 = 0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows_erased,
           MIN(day) AS first_day,
           MAX(day) AS last_day,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days_touched,
           CAST(0 AS BIGINT) AS n_residual_rows
    FROM e GROUP BY user_id
    ORDER BY user_id LIMIT 20
"""

# x107: pure per-partition aggregate classification; all counts exact
# longs, ratio an int/int division.
ORACLE["x107_retention_plan"] = """
    WITH wm AS (SELECT MAX(date_trunc('day', ts)) AS max_day FROM events),
    per_day AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(*) AS n_rows,
               SUM(CASE WHEN date_diff('day', date_trunc('day', ts),
                                       max_day)
                             > (CASE WHEN event_type = 'error' THEN 10
                                     WHEN event_type = 'click' THEN 20
                                     ELSE 25 END)
                        THEN 1 ELSE 0 END) AS n_expired
        FROM events, wm GROUP BY 1
    )
    SELECT action,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(n_expired) AS BIGINT) AS n_rows_expired,
           ROUND(SUM(n_expired)::DOUBLE / SUM(n_rows), 6)
               AS reclaim_ratio
    FROM (
        SELECT CASE WHEN n_expired = 0 THEN 'KEEP'
                    WHEN n_expired = n_rows THEN 'DROP'
                    ELSE 'REWRITE' END AS action,
               n_rows, n_expired
        FROM per_day
    )
    GROUP BY action ORDER BY action
"""

# x104: one full-outer join classified into add/delete/change legs;
# all counts exact longs.
ORACLE["x104_snapshot_diff"] = """
    WITH a AS (
        SELECT event_id AS k, event_type AS ta, value AS va
        FROM events WHERE event_id % 7 <> 0
    ),
    b AS (
        SELECT event_id AS k, event_type AS tb,
               CASE WHEN event_id % 11 = 0 THEN value + 1.0
                    ELSE value END AS vb
        FROM events WHERE event_id % 13 <> 0
    ),
    j AS (
        SELECT COALESCE(b.tb, a.ta) AS event_type,
               a.ta, b.tb, a.va, b.vb
        FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN tb IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN ta IS NULL AND tb IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN ta IS NOT NULL AND tb IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
           CAST(SUM(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL
                              AND va <> vb
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
    FROM j GROUP BY event_type ORDER BY event_type
"""

# x108: the x107 classification replayed logically, with the post-
# state columns derived analytically (execution is exact, so
# n_parts_after = 0 for DROP / n_partitions otherwise, rows_after =
# rows_before − rows_expired, stale = 0) and the executed counts
# equal to the plan's class sizes.
ORACLE["x108_retention_execute"] = """
    WITH wm AS (SELECT MAX(date_trunc('day', ts)) AS max_day FROM events),
    per_day AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(*) AS n_rows,
               SUM(CASE WHEN date_diff('day', date_trunc('day', ts),
                                       max_day)
                             > (CASE WHEN event_type = 'error' THEN 10
                                     WHEN event_type = 'click' THEN 20
                                     ELSE 25 END)
                        THEN 1 ELSE 0 END) AS n_expired
        FROM events, wm GROUP BY 1
    ),
    classed AS (
        SELECT CASE WHEN n_expired = 0 THEN 'KEEP'
                    WHEN n_expired = n_rows THEN 'DROP'
                    ELSE 'REWRITE' END AS action,
               n_rows, n_expired
        FROM per_day
    ),
    exec_n AS (
        SELECT SUM(CASE WHEN action = 'DROP' THEN 1 ELSE 0 END)
                   AS n_drop,
               SUM(CASE WHEN action = 'REWRITE' THEN 1 ELSE 0 END)
                   AS n_rewrite
        FROM classed
    )
    SELECT action,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(CASE WHEN action = 'DROP' THEN 0 ELSE 1 END)
                AS BIGINT) AS n_parts_after,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows_before,
           CAST(SUM(n_expired) AS BIGINT) AS n_rows_expired,
           CAST(SUM(n_rows - n_expired) AS BIGINT) AS n_rows_after,
           CAST(0 AS BIGINT) AS n_stale_rows,
           CAST(exec_n.n_drop AS BIGINT) AS n_dropped_exec,
           CAST(exec_n.n_rewrite AS BIGINT) AS n_rewritten_exec
    FROM classed CROSS JOIN exec_n
    GROUP BY action, exec_n.n_drop, exec_n.n_rewrite
    ORDER BY action
"""

# s17: the ticked enforcement replayed as its one-shot equivalent
# (retention is idempotent + watermark-monotone); the touched-
# partition total decomposes as tick 1 (days with any row expired at
# wm−3) plus tick 2 (days with a row surviving wm−3 but expired at
# wm) — the feed's ticks land in write order (mtime-ordered file
# source), the same two-batch argument s16 relies on.
ORACLE["s17_streaming_retention"] = """
    WITH wm AS (SELECT MAX(date_trunc('day', ts)) AS max_day FROM events),
    rows_c AS (
        SELECT event_type,
               date_diff('day', date_trunc('day', ts), max_day)
                   AS age,
               (CASE WHEN event_type = 'error' THEN 10
                     WHEN event_type = 'click' THEN 20
                     ELSE 25 END) AS ttl,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
        FROM events, wm
    ),
    before AS (
        SELECT event_type, COUNT(*) AS n_before
        FROM rows_c GROUP BY event_type
    ),
    after AS (
        SELECT event_type, COUNT(*) AS n_after
        FROM rows_c WHERE age <= ttl GROUP BY event_type
    ),
    t1 AS (
        SELECT COUNT(DISTINCT day) AS n FROM rows_c
        WHERE age - 3 > ttl
    ),
    t2 AS (
        SELECT COUNT(DISTINCT day) AS n FROM rows_c
        WHERE age - 3 <= ttl AND age > ttl
    )
    SELECT b.event_type,
           CAST(b.n_before AS BIGINT) AS n_before,
           CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
           CAST(b.n_before - COALESCE(a.n_after, 0) AS BIGINT)
               AS n_expired,
           CAST(0 AS BIGINT) AS n_residual_expired,
           CAST(2 AS BIGINT) AS n_ticks,
           CAST(t1.n + t2.n AS BIGINT) AS n_parts_touched_total
    FROM before b LEFT JOIN after a ON b.event_type = a.event_type,
         t1, t2
    ORDER BY b.event_type
"""

# s18: the streaming fold is a pure function of the deduplicated
# event set, so the oracle replays the ONE-SHOT SCD2 window build
# over the whole feed (the x65 kernel) plus the mechanical
# accounting: 2 batches (two feed files, one per trigger), and the
# bucket fan-out = distinct (user_id % 8) among each parity class's
# users.
ORACLE["s18_streaming_scd2"] = """
    WITH ev AS (
        SELECT DISTINCT user_id, event_type,
               CAST(EPOCH(date_trunc('second', ts)) AS BIGINT) AS ts_s
        FROM events WHERE user_id % 7 = 0
    ),
    dim AS (
        SELECT user_id, event_type,
               ts_s AS valid_from,
               COALESCE(LEAD(ts_s) OVER w, 4611686018427387904)
                   AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INT) AS version
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_type)
    ),
    rew AS (
        SELECT (SELECT COUNT(DISTINCT user_id % 8) FROM events
                WHERE user_id % 7 = 0 AND event_id % 2 = 0)
             + (SELECT COUNT(DISTINCT user_id % 8) FROM events
                WHERE user_id % 7 = 0 AND event_id % 2 = 1) AS n
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN valid_to = 4611686018427387904
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(version) AS BIGINT) AS version_sum,
           CAST(2 AS BIGINT) AS n_batches,
           CAST(rew.n AS BIGINT) AS n_bucket_rewrites
    FROM dim, rew
    GROUP BY event_type, rew.n
    ORDER BY event_type
"""

# x109: the per-day x108 classification replayed logically for the
# touched days (n_expired > 0); post columns analytic (execution is
# exact): DROP days read back absent (dir_removed=1, 0 rows), REWRITE
# days keep exactly the unexpired rows; stale = 0.
ORACLE["x109_retention_certificate"] = """
    WITH wm AS (SELECT MAX(date_trunc('day', ts)) AS max_day FROM events),
    per_day AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(*) AS n_rows,
               SUM(CASE WHEN date_diff('day', date_trunc('day', ts),
                                       max_day)
                             > (CASE WHEN event_type = 'error' THEN 10
                                     WHEN event_type = 'click' THEN 20
                                     ELSE 25 END)
                        THEN 1 ELSE 0 END) AS n_expired
        FROM events, wm GROUP BY 1
    )
    SELECT day,
           CASE WHEN n_expired = n_rows THEN 'DROP'
                ELSE 'REWRITE' END AS action,
           CAST(n_rows AS BIGINT) AS n_rows_before,
           CAST(n_expired AS BIGINT) AS n_rows_expired,
           CAST(n_rows - n_expired AS BIGINT) AS n_rows_after,
           CAST(CASE WHEN n_expired = n_rows THEN 1 ELSE 0 END
                AS INTEGER) AS dir_removed,
           CAST(0 AS BIGINT) AS n_stale_rows
    FROM per_day
    WHERE n_expired > 0
    ORDER BY day
    LIMIT 20
"""

# x110: the composed mutations replayed as the one-shot logical
# filter (row predicates commute); the order-specific phase counts
# replayed analytically: erase fan-out over the original mart, then
# DROP/REWRITE classes over the post-erase rows.
ORACLE["x110_erasure_then_retention"] = """
    WITH wm AS (SELECT MAX(date_trunc('day', ts)) AS max_day FROM events),
    erased AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ),
    rows_c AS (
        SELECT event_id, user_id, event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               date_diff('day', date_trunc('day', ts), max_day)
                   > (CASE WHEN event_type = 'error' THEN 10
                           WHEN event_type = 'click' THEN 20
                           ELSE 25 END) AS expired,
               user_id % 97 = 0 AS is_erased
        FROM events, wm
    ),
    before AS (
        SELECT event_type, COUNT(*) AS n_before
        FROM rows_c GROUP BY event_type
    ),
    after AS (
        SELECT event_type, COUNT(*) AS n_after
        FROM rows_c WHERE NOT is_erased AND NOT expired
        GROUP BY event_type
    ),
    pe AS (
        SELECT COUNT(DISTINCT day) AS n FROM rows_c WHERE is_erased
    ),
    ret AS (
        SELECT day, COUNT(*) AS n, SUM(CASE WHEN expired THEN 1 ELSE 0
                                       END) AS e
        FROM rows_c WHERE NOT is_erased GROUP BY day
    ),
    rc AS (
        SELECT SUM(CASE WHEN e = n THEN 1 ELSE 0 END) AS n_drop,
               SUM(CASE WHEN e > 0 AND e < n THEN 1 ELSE 0 END)
                   AS n_rewrite
        FROM ret
    )
    SELECT b.event_type,
           CAST(b.n_before AS BIGINT) AS n_before,
           CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
           CAST(0 AS BIGINT) AS n_residual_erased,
           CAST(0 AS BIGINT) AS n_residual_expired,
           CAST(pe.n AS BIGINT) AS n_parts_erase,
           CAST(rc.n_drop AS BIGINT) AS n_parts_dropped,
           CAST(rc.n_rewrite AS BIGINT) AS n_parts_rewritten
    FROM before b LEFT JOIN after a ON b.event_type = a.event_type,
         pe, rc
    ORDER BY b.event_type
"""

# x111: both classifications from one per-day aggregate; all counts
# exact longs.
ORACLE["x111_retention_forecast"] = """
    WITH wm AS (SELECT MAX(date_trunc('day', ts)) AS max_day FROM events),
    per_day AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(*) AS n_rows,
               SUM(CASE WHEN date_diff('day', date_trunc('day', ts),
                                       max_day)
                             > (CASE WHEN event_type = 'error' THEN 10
                                     WHEN event_type = 'click' THEN 20
                                     ELSE 25 END)
                        THEN 1 ELSE 0 END) AS e_now,
               SUM(CASE WHEN date_diff('day', date_trunc('day', ts),
                                       max_day) + 7
                             > (CASE WHEN event_type = 'error' THEN 10
                                     WHEN event_type = 'click' THEN 20
                                     ELSE 25 END)
                        THEN 1 ELSE 0 END) AS e_next
        FROM events, wm GROUP BY 1
    ),
    classed AS (
        SELECT CASE WHEN e_now = 0 THEN 'KEEP'
                    WHEN e_now = n_rows THEN 'DROP'
                    ELSE 'REWRITE' END AS action_now,
               CASE WHEN e_next = 0 THEN 'KEEP'
                    WHEN e_next = n_rows THEN 'DROP'
                    ELSE 'REWRITE' END AS action_next,
               n_rows, e_next - e_now AS newly_exp
        FROM per_day
    )
    SELECT action_now, action_next,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(newly_exp) AS BIGINT) AS n_rows_newly_expiring
    FROM classed
    GROUP BY action_now, action_next
    ORDER BY action_now, action_next
"""
