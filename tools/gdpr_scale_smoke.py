"""GDPR-erasure + retention-enforcement scale smoke: the round-9/10
partition-swap execution family (x103/x105/x108/x110) at 10x-100x the
bench scale.

Generates an events-shaped mart partitioned by day (N rows over
~400 day partitions, JVM expressions only), then measures the
mutation primitives off the stored table:

- erase_keys_path for ~1% of users: cost must track the erased keys'
  partition FAN-OUT (here: every partition holds every user, so this
  is the worst case — a full copy-on-write rewrite pass);
- a second erase of ALREADY-ERASED keys: the semi-join probe finds
  zero affected partitions, so the cost is ONE id-pruned scan and no
  writes — the idempotence fast path;
- enforce_retention_path at a TTL that expires ~25% of days: DROP
  days are O(1) directory removals (zero rows read), surviving days
  untouched — cost tracks the expired fan-out, never the table;
- a second enforcement at the same watermark: nothing left expired,
  zero partitions touched (watermark-monotone idempotence).

Linear-or-better growth on the first erase and sublinear cost on the
drop-dominated retention pass are the 100 TB arguments. Timings land
in PLANS.md / BASELINE.md.

Usage: python tools/gdpr_scale_smoke.py [n_rows]
"""

from __future__ import annotations

import atexit
import shutil
import sys
import tempfile
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
_DIR = tempfile.mkdtemp(prefix="gdpr_smoke_")
atexit.register(lambda: shutil.rmtree(_DIR, ignore_errors=True))


def timed(label, fn):
    t = time.time()
    out = fn()
    extra = f"  [{out}]" if out is not None else ""
    print(f"{label:52s} {time.time() - t:6.2f} s{extra}")


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from dislib_spark.session import get_spark
    from dislib_spark.sources.merge import (
        enforce_retention_path,
        erase_keys_path,
    )

    spark = get_spark(app_name="gdpr-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    n_users = max(N // 1000, 1)
    n_days = 400
    mart = f"{_DIR}/mart"

    def gen_mart():
        (
            spark.range(N)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % n_users).alias("user_id"),
                F.date_format(
                    F.date_add(
                        F.lit("2024-01-01").cast("date"),
                        F.pmod(F.xxhash64("id"), n_days).cast("int"),
                    ),
                    "yyyy-MM-dd",
                ).alias("day"),
                (F.pmod(F.xxhash64("id", F.lit(1)), 10000) / 100.0).alias(
                    "value"
                ),
            )
            .write.partitionBy("day")
            .mode("overwrite")
            .parquet(mart)
        )

    timed(f"generate {N}-row mart ({n_days} day partitions)", gen_mart)

    erased = (
        spark.range(n_users)
        .where(F.col("id") % 100 == 0)
        .select(F.col("id").alias("user_id"))
    )

    timed(
        "erase 1% of users (worst case: all partitions hit)",
        lambda: f"{erase_keys_path(spark, mart, erased, 'user_id', 'day')} parts",
    )
    timed(
        "re-erase same users (idempotent: 0 parts, probe only)",
        lambda: f"{erase_keys_path(spark, mart, erased, 'user_id', 'day')} parts",
    )

    # TTL 300 days at the max-day watermark: ~25% of day partitions
    # expire ENTIRELY (uniform day hash, single global TTL) → all
    # DROP, zero REWRITE, zero rows read.
    wm = (
        spark.read.parquet(mart)
        .agg(F.max("day").alias("d"))
        .first()["d"]
    )

    def run_retention():
        n_drop, n_rw = enforce_retention_path(
            spark, mart, "day", F.lit(300), wm
        )
        return f"{n_drop} dropped, {n_rw} rewritten"

    timed("enforce 300-day TTL (~25% of days drop)", run_retention)
    timed(
        "re-enforce same TTL (idempotent: nothing expired)",
        run_retention,
    )

    n_left = spark.read.parquet(mart).count()
    print(f"{'post-state rows':52s}        [{n_left}]")


if __name__ == "__main__":
    main()
