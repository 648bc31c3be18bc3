"""Z-order layout: Morton-code parity vs a python reference, and the
locality property that makes it a data-skipping op — after
cluster_by_zorder, every partition confines EVERY key dimension to a
narrow range (vs. an unclustered layout where each partition spans
the whole space)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _py_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z += ((x >> i) & 1) << (2 * i)
        z += ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_python(spark):
    from dislib_spark.sources.zorder import zorder_value

    rows = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_value([F.col("x"), F.col("y")], bits=8).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y), (x, y)


def test_quantize_bounds_and_clamping(spark):
    from dislib_spark.sources.zorder import quantize

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "v double"
    )
    got = [
        r["q"]
        for r in df.select(
            quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q")
        ).collect()
    ]
    assert got[0] == 0  # below lo clamps
    assert got[1] == 0
    assert 0 < got[2] < 255
    assert got[3] == 255
    assert got[4] == 255  # above hi clamps


def test_cluster_by_zorder_confines_both_dims(spark):
    """16 range partitions over the z-code of a 256×256 uniform grid:
    every partition's x-range AND y-range must be far narrower than
    the full 0..255 span (the multi-dimensional pruning property);
    a plain sort by x alone leaves y unpruned."""
    from dislib_spark.sources.zorder import cluster_by_zorder, zorder_value

    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
    )
    clustered = cluster_by_zorder(
        grid, [F.col("x"), F.col("y")], bits=8, num_partitions=16
    )
    spans = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(spans) >= 8
    # A contiguous Morton range is a union of a few aligned tiles, so
    # MOST partitions confine both dims tightly; a partition whose
    # range straddles a high-bit curve jump can briefly span a full
    # dim (inherent to z-order — pruning effectiveness is per-file
    # statistical, which is exactly how min-max skipping consumes it).
    xs = sorted(r["xs"] for r in spans)
    ys = sorted(r["ys"] for r in spans)
    assert xs[len(xs) // 2] <= 128  # median partition: ≤ half the space
    assert ys[len(ys) // 2] <= 128
    assert sum(xs) / len(xs) <= 170
    assert sum(ys) / len(ys) <= 170
    # control: sorting by x alone leaves y spanning the whole space
    xsorted = grid.repartitionByRange(16, "x")
    yspan = (
        xsorted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("y") - F.min("y")).alias("ys"))
        .agg(F.max("ys").alias("m"))
        .collect()[0]["m"]
    )
    assert yspan == 255
