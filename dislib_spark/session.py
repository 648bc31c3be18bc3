"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
same configs are the ones we would set cluster-side at 100 TB:
AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for the pandas-UDF paths, and a shuffle-partition
count sized to the deployment (32 locally; thousands on a real
cluster — AQE coalesces the excess).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dislib-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | str | None = None,
) -> SparkSession:
    """Create (or reuse) the engine's SparkSession."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    )
    # protobuf fallback must land in PYTHONPATH BEFORE the JVM starts:
    # the transformWithState driver-side python worker inherits the
    # JVM's env, which is frozen at gateway launch (addPyFile alone
    # cannot reach it). No-op when the wheel is installed.
    from dislib_spark.streaming.stateful import ensure_protobuf

    ensure_protobuf()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime coalescing, skew-join handling, join-strategy
        # switching — essential at 100 TB, free locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for pandas UDFs / toPandas (10-100x vs pickle).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics for oracle parity.
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) — read as long, then
        # tables.load_table converts to a proper timestamp column.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # 340+ codegen-heavy queries in one JVM overflow the default
        # ~240 MB code cache: the JIT silently evicts/deopts and
        # expression-heavy items sporadically run 10-20x slower
        # (measured t11 0.7 s -> 15-19 s mid-bench at 512 MB the
        # surface was ~80 queries; at 343 queries the same spike
        # recurred — t11 0.86 s -> 9.0 s, r10 bench — so the cache is
        # sized to the grown surface; 1 g still showed mid-batch
        # flush/deopt churn on the m43-m48 expression cluster, 2 g —
        # the HotSpot maximum — cleared it). Reserved address space,
        # not committed RSS, so the only cost is virtual. Same setting
        # a real cluster would carry in spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
