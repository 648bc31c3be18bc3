"""Benchmark harness (driver contract).

Runs the declared query set plus representative estimator fits at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Timing uses the noop sink — full computation, no driver
materialization (collect would melt at scale and measure the wrong
thing).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _run_df(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from dislib_spark.session import get_spark
    from dislib_spark.queries import all_queries

    spark = get_spark(app_name="dislib-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name, fn in sorted(all_queries().items()):
        try:
            timings[name] = round(_run_df(fn(spark, sf_dir)), 3)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        # release caches/localCheckpoint blocks between items so one
        # query's storage doesn't skew the next one's timing
        spark.catalog.clearCache()
        import gc

        gc.collect()

    # estimator fits (BASELINE.md ledger items)
    from pyspark.sql import functions as F

    from dislib_spark.array.core import DsArray
    from dislib_spark.cluster.kmeans import KMeans
    from dislib_spark.regression.linear import ols_fit
    from dislib_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    n_emb = emb.count()
    x = DsArray(emb, (n_emb, 64))

    t0 = time.perf_counter()
    KMeans(n_clusters=8, max_iter=10, random_state=42).fit(x)
    timings["fit_kmeans_embeddings"] = round(time.perf_counter() - t0, 3)

    li = load_table(spark, sf_dir, "lineitem")
    t0 = time.perf_counter()
    ols_fit(li, ["l_quantity"], "l_extendedprice")
    timings["fit_ols_lineitem"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    li.orderBy("l_quantity").write.format("noop").mode("overwrite").save()
    timings["terasort_lineitem"] = round(time.perf_counter() - t0, 3)

    # RF fit (embeddings -> synthetic label) — BASELINE.md ledger item
    from dislib_spark.classification.forest import RandomForestClassifier

    y = DsArray(
        emb.select(
            "row_id",
            F.array((F.xxhash64(F.col("row_id")) % 2 == 0).cast("double")).alias(
                "features"
            ),
        ),
        (n_emb, 1),
    )
    t0 = time.perf_counter()
    RandomForestClassifier(n_estimators=10, max_depth=8, random_state=7).fit(x, y)
    timings["fit_rf_embeddings"] = round(time.perf_counter() - t0, 3)

    # ALS fit (synthetic ratings from events) — BASELINE.md ledger item
    from dislib_spark.recommendation.als import ALS

    ev = load_table(spark, sf_dir, "events")
    ratings = ev.select(
        (F.col("user_id") % 500).cast("int").alias("user_id"),
        (F.col("event_id") % 200).cast("int").alias("item_id"),
        (F.pmod(F.col("value"), F.lit(5.0)) + 1.0).alias("rating"),
    )
    t0 = time.perf_counter()
    ALS(n_f=8, max_iter=5, random_state=11).fit(ratings)
    timings["fit_als_events"] = round(time.perf_counter() - t0, 3)

    total = round(sum(v for v in timings.values() if v > 0), 3)
    print(
        json.dumps(
            {
                "metric": "declared_query_batch_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
