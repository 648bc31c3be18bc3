"""Temporal + quantization scale smoke: the round-3 operators at
10x-100x the bench scale.

Generates an events-shaped table (N rows, ~1k events/user, JVM
expressions only), writes it to a per-run parquet scratch dir and
measures off a real scan (same methodology as tpch_scale_smoke):

- sessionize + per-session aggregate: the gaps-and-islands window
  must stay partitionBy(user) — linear growth shows no global sort;
- recency_weighted_sum: one map-side-combined aggregation — growth
  should track the scan;
- SQ8 error report over N/10 generated 64-dim vectors: one
  min/max pass + map-side codes, the no-explode property is what
  keeps it linear.

Timings land in BASELINE.md.

Usage: python tools/temporal_scale_smoke.py [n_rows]
"""

from __future__ import annotations

import atexit
import shutil
import sys
import tempfile
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
_DIR = tempfile.mkdtemp(prefix="temporal_smoke_")
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
    from dislib_spark.temporal import recency_weighted_sum, sessionize

    spark = get_spark(app_name="temporal-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    n_users = max(N // 1000, 1)

    def gen_events():
        (
            spark.range(N)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % n_users).alias("user_id"),
                # per-user event times jump pseudo-randomly 0..2h so
                # ~25% of gaps cross the 30-min session threshold
                F.timestamp_seconds(
                    F.lit(1704067200)
                    + (F.col("id") / n_users).cast("long") * 600
                    + F.pmod(F.xxhash64("id"), 6600)
                ).alias("ts"),
                (F.pmod(F.xxhash64("id", F.lit(1)), 10000) / 100.0).alias(
                    "value"
                ),
            )
            .write.mode("overwrite")
            .parquet(f"{_DIR}/events")
        )

    timed(f"generate {N} events ({n_users} users)", gen_events)
    ev = spark.read.parquet(f"{_DIR}/events")

    def run_sessionize():
        (
            sessionize(ev, "user_id", "ts", "30 minutes", tiebreak="event_id")
            .groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    timed("sessionize + per-session agg", run_sessionize)

    def run_decay():
        (
            recency_weighted_sum(
                ev, "user_id", "ts", "value",
                half_life=7 * 86400.0, t_ref_epoch=1706745600,
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    timed("recency_weighted_sum", run_decay)

    def run_twap():
        from dislib_spark.temporal import twap

        (
            twap(ev, "user_id", "ts", "value", bucket="day",
                 tiebreak="event_id")
            .write.format("noop").mode("overwrite").save()
        )

    timed("twap (lead window + agg)", run_twap)

    def run_ohlc():
        from dislib_spark.temporal import ohlc_bars

        (
            ohlc_bars(ev, "user_id", "ts", "value", bucket="hour",
                      tiebreak="event_id")
            .write.format("noop").mode("overwrite").save()
        )

    timed("ohlc bars (single agg)", run_ohlc)

    nv = max(N // 10, 1)

    def gen_vectors():
        (
            spark.range(nv)
            .select(
                F.col("id").alias("vec_id"),
                (F.col("id") % 16).cast("int").alias("label"),
                F.array(
                    *[
                        (
                            F.pmod(
                                F.xxhash64("id", F.lit(j)), F.lit(100000)
                            ).cast("double")
                            / 50000.0
                            - 1.0
                        ).cast("float")
                        for j in range(64)
                    ]
                ).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(f"{_DIR}/vecs")
        )

    timed(f"generate {nv} 64-dim vectors", gen_vectors)
    vecs = spark.read.parquet(f"{_DIR}/vecs")

    def run_sq8():
        from dislib_spark.vector.quantize import sq8_error_stats

        sq8_error_stats(vecs, "embedding", 64, by="label").write.format(
            "noop"
        ).mode("overwrite").save()

    timed("SQ8 error report (min/max + codes)", run_sq8)

    def run_hamming():
        from dislib_spark.vector.quantize import hamming_topk

        q = vecs.where(F.col("vec_id") < 5)
        hamming_topk(q, vecs, dim=64, k=10).write.format("noop").mode(
            "overwrite"
        ).save()

    timed("binary-quantize Hamming top-10 x5 queries", run_hamming)


if __name__ == "__main__":
    main()
