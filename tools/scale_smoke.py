"""1M-row scale smoke (beyond the sf parquet tables).

Mirrors the reference's random-matrix perf workloads
(tests/performance/mn4/tests/kmeans.py etc.) at single-node scale:
generate a 1M×20 matrix JVM-side, then run the distributed kernels
that must stay JVM/Arrow-side at 100 TB. Timings land in BASELINE.md.

Usage: python tools/scale_smoke.py [n_rows]
"""

from __future__ import annotations

import sys
import time

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = 20


def timed(label, fn):
    t = time.time()
    out = fn()
    print(f"{label:34s} {time.time() - t:6.2f} s")
    return out


def main():
    sys.path.insert(0, "/root/repo")
    import dislib_spark as ds
    from dislib_spark.array.core import DsArray
    from dislib_spark.array.linalg import matmul
    from dislib_spark.cluster import KMeans
    from dislib_spark.regression.linear import ols_fit
    from dislib_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="scale-smoke")

    def gen():
        a = ds.random_array((N, D), spark)
        df = a.df.cache()
        df.count()  # materialize once; every kernel reuses the cache
        return DsArray(df, a.shape)

    x = timed(f"generate {N}x{D} (JVM rand)", gen)

    timed(
        "KMeans k=16 x5 iters",
        lambda: KMeans(n_clusters=16, max_iter=5, random_state=1).fit(x),
    )

    df = x.df.select(
        "row_id",
        *[F.element_at("features", j + 1).alias(f"f{j}") for j in range(8)],
        (
            F.element_at("features", 1) * 2.0
            + F.element_at("features", 2) * -1.0
            + F.rand(7) * 0.01
        ).alias("y"),
    )
    coef, _ = timed(
        "OLS normal equations (8 features)",
        lambda: ols_fit(df, [f"f{j}" for j in range(8)], "y"),
    )
    assert abs(coef[0] - 2.0) < 0.01 and abs(coef[1] + 1.0) < 0.01

    timed(
        "global sort (1 column)",
        lambda: x.df.orderBy(F.element_at("features", 1)).write.format(
            "noop"
        ).mode("overwrite").save(),
    )

    # Gramian AᵀA (20×20 out) — auto-dispatches to packed partials
    g = timed(
        "matmul A^T @ A (gram partials)",
        lambda: matmul(x, x, transpose_a=True).collect(),
    )
    # cheap sanity: Gramian of uniform[0,1) has diag ≈ N/3
    assert np.allclose(np.diag(g), N / 3.0, rtol=0.01)

    # tall @ small via the broadcast-local path
    w = np.arange(D * 8, dtype=np.float64).reshape(D, 8) / 100.0
    from dislib_spark.array.linalg import _matmul_local

    timed(
        "matmul A @ W (1Mx20 @ 20x8, local W)",
        lambda: _matmul_local(x, w).df.write.format("noop").mode(
            "overwrite"
        ).save(),
    )

    def stride_sketch_item():
        from dislib_spark.sketches import (
            merged_stride_quantiles,
            stride_partials,
        )

        vals = x.df.select(
            "row_id", F.element_at("features", 1).alias("v")
        )
        parts = stride_partials(
            vals, "v", F.col("row_id"), (F.col("row_id") % 8),
            k=256, shards=32,
        )
        return merged_stride_quantiles(parts).count()

    timed(
        "stride sketch partials+merge (8 parts x 32 shards, k=256)",
        stride_sketch_item,
    )

    def running_max_item():
        from dislib_spark.utils.base import with_running_max

        vals = x.df.select(
            "row_id", F.element_at("features", 1).alias("v")
        )
        return (
            with_running_max(
                vals, "v", ["row_id"], "rm", inclusive=False
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    timed("running max (distributed prefix, 1M)", running_max_item)

    def md5_hll_item():
        from dislib_spark.sketches import (
            md5_hll_estimate,
            md5_hll_partials,
        )

        vals = x.df.select(
            "row_id", (F.col("row_id") % 16).alias("g")
        )
        parts = md5_hll_partials(vals, "row_id", ["g"])
        return md5_hll_estimate(parts, ["g"]).count()

    timed("md5-HLL partials+estimate (16 groups, 1M)", md5_hll_item)

    spark.stop()


if __name__ == "__main__":
    main()
