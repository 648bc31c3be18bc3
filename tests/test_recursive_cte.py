"""Recursive CTE support (new in Spark 4.x): pinned against the
non-recursive sequence() spine the engine uses in production (x46).

Recursive CTEs execute ITERATIVELY in Spark — one job per level, and
the recursive member's whole subtree (including any base-table
references) re-evaluates every level — so generator-style recursion
over N levels costs N scans. That's why x46's gap-fill uses
``sequence()`` (one job) and recursion stays a compatibility surface,
not the scale path."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.tables import load_table, register_views

SF = "/root/testdata/sf0.001"


def test_recursive_cte_basic(spark):
    out = spark.sql(
        """
        WITH RECURSIVE t(n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100
        ) SELECT COUNT(*) AS c, SUM(n) AS s FROM t
        """
    ).collect()[0]
    assert (out.c, out.s) == (100, 5050)


def test_recursive_spine_matches_sequence_spine(spark):
    register_views(spark, SF)
    rec = spark.sql(
        """
        WITH RECURSIVE bounds AS (
            SELECT CAST(DATE_TRUNC('year', MIN(o_orderdate)) AS DATE) AS lo,
                   CAST(DATE_TRUNC('year', MAX(o_orderdate)) AS DATE) AS hi
            FROM orders
        ),
        years(y) AS (
            SELECT lo FROM bounds
            UNION ALL
            SELECT CAST(y + INTERVAL 1 YEAR AS DATE)
            FROM years, bounds WHERE y < hi
        )
        SELECT y FROM years ORDER BY y
        """
    ).collect()
    o = load_table(spark, SF, "orders")
    seq = (
        o.agg(
            F.date_trunc("year", F.min("o_orderdate"))
            .cast("date")
            .alias("lo"),
            F.date_trunc("year", F.max("o_orderdate"))
            .cast("date")
            .alias("hi"),
        )
        .select(
            F.explode(
                F.expr("sequence(lo, hi, interval 1 year)")
            ).alias("y")
        )
        .orderBy("y")
        .collect()
    )
    assert [r.y for r in rec] == [r.y for r in seq]
    assert len(rec) >= 2
