"""Relational scale smoke: TPC-H shapes on a generated 10x lineitem.

The sf parquet tables cap at sf0.1 (~600k lineitem). This tool
generates a lineitem-shaped table of N rows JVM-side (expression-only,
no Python row hops), writes it to a per-run parquet scratch dir
(operators measured off a real scan, same methodology as
text_scale_smoke), and times the three relational archetypes whose
100 TB behavior the bench can't show:

- Q1 shape: wide decimal aggregate, map-side combined, 6 groups;
- Q6 shape: pushdown-only selective scan, zero joins;
- co-purchase shape: distinct pre-agg + self-join on the order key.

Linear wall-clock growth vs the sf0.1 bench numbers is the evidence
that the plans are scan/shuffle-bound (no accidental quadratic or
driver-bound step). Timings land in BASELINE.md.

Usage: python tools/tpch_scale_smoke.py [n_rows]
"""

from __future__ import annotations

import atexit
import shutil
import sys
import tempfile
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
_DIR = tempfile.mkdtemp(prefix="tpch_smoke_")
atexit.register(lambda: shutil.rmtree(_DIR, ignore_errors=True))


def timed(label, fn):
    t = time.time()
    fn()
    print(f"{label:44s} {time.time() - t:6.2f} s")


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from dislib_spark.session import get_spark

    spark = get_spark(app_name="tpch-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def gen():
        h = lambda k: F.xxhash64(F.col("id") * 131 + k)  # noqa: E731
        df = spark.range(0, N, 1, par).select(
            (F.col("id") / 4).cast("long").alias("l_orderkey"),
            F.pmod(h(1), F.lit(20_000)).alias("l_partkey"),
            (F.pmod(h(2), F.lit(5000)) / 100.0 + 1.0).alias("l_quantity"),
            (F.pmod(h(3), F.lit(9_000_000)) / 100.0 + 1000.0).alias(
                "l_extendedprice"
            ),
            (F.pmod(h(4), F.lit(11)) / 100.0).alias("l_discount"),
            (F.pmod(h(5), F.lit(9)) / 100.0).alias("l_tax"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                (F.pmod(h(6), F.lit(3)) + 1).cast("int"),
            ).alias("l_returnflag"),
            F.element_at(
                F.array(F.lit("F"), F.lit("O")),
                (F.pmod(h(7), F.lit(2)) + 1).cast("int"),
            ).alias("l_linestatus"),
            F.date_add(
                F.lit("1995-01-01").cast("date"),
                F.pmod(h(8), F.lit(2500)).cast("int"),
            ).alias("l_shipdate"),
        )
        df.write.mode("overwrite").parquet(_DIR + "/lineitem.parquet")

    timed(f"generate {N} lineitem rows (JVM expr)", gen)
    li = spark.read.parquet(_DIR + "/lineitem.parquet")

    def q1():
        (
            li.where(F.col("l_shipdate") <= "2001-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ).cast("double").alias("sum_disc_price"),
                F.count(F.lit(1)).alias("n"),
            )
            .write.format("noop").mode("overwrite").save()
        )

    def q6():
        (
            li.where(
                (F.col("l_shipdate") >= "1997-01-01")
                & (F.col("l_shipdate") < "1998-01-01")
                & F.col("l_discount").between(0.05, 0.07)
                & (F.col("l_quantity") < 24)
            )
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,4)"
                    )
                ).cast("double").alias("revenue")
            )
            .write.format("noop").mode("overwrite").save()
        )

    def basket():
        b = li.select("l_orderkey", "l_partkey").distinct()
        a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
        c = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
        (
            a.join(c, "ok")
            .where(F.col("p1") < F.col("p2"))
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= 3)
            .write.format("noop").mode("overwrite").save()
        )

    def corr():
        from dislib_spark.math.stats import correlation_matrix

        correlation_matrix(
            li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ).write.format("noop").mode("overwrite").save()

    def merge():
        from dislib_spark.sources.merge import merge_into

        t = li.select("l_orderkey", "l_partkey", "l_extendedprice")
        upd = t.where(F.col("l_orderkey") % 100 == 0).select(
            "l_orderkey",
            "l_partkey",
            (F.col("l_extendedprice") + 1.0).alias("l_extendedprice"),
        )
        merge_into(t, upd, ["l_orderkey", "l_partkey"]).write.format(
            "noop"
        ).mode("overwrite").save()

    def ks_exact():
        from dislib_spark.math.stats import ks_statistic

        ks_statistic(
            li, "l_extendedprice", "l_returnflag", "R", "N"
        ).write.format("noop").mode("overwrite").save()

    def ks_binned():
        from dislib_spark.math.stats import ks_statistic

        ks_statistic(
            li, "l_extendedprice", "l_returnflag", "R", "N", n_bins=4096
        ).write.format("noop").mode("overwrite").save()

    timed("Q1 shape: wide agg, 6 groups", q1)
    timed("Q6 shape: pushdown-only scan", q6)
    timed("co-purchase: distinct + self-join", basket)
    timed("corr matrix: one-pass 4-col sufficient stats", corr)
    timed("MERGE upsert: full-outer join on 2-col key", merge)
    # KS: the exact path's global ECDF window is bounded by the
    # distinct-value count (~900k here); the binned path bounds it at
    # n_bins regardless of rows — the 100 TB contrast this smoke shows
    timed("KS exact: distinct-value ECDF window", ks_exact)
    timed("KS binned(4096): bounded ECDF window", ks_binned)


if __name__ == "__main__":
    main()
