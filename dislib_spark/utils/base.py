"""Shared estimator plumbing + utils.shuffle / label helpers.

Reference: ``dislib/utils/base.py`` (shuffle :11-90, _paired_partition
:204-215).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure a CPU-heavy downstream projection runs with at least the
    session's parallelism.

    Small single-row-group parquet files are unsplittable, so a scan
    can come up as ONE partition and serialize minutes of per-row
    compute (shingling, minhash permutations) onto one core. At the
    100 TB target the scan already has thousands of splits and this is
    a NO-OP — no extra shuffle; the repartition only fires on
    under-split inputs, where shuffling a few MB of text is free
    relative to the compute it parallelizes.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_global_index(
    df: DataFrame,
    order_by: list | None = None,
    idx_col: str = "_idx",
) -> DataFrame:
    """Contiguous 0-based global index (in ``order_by`` order, or the
    input partition order when None), fully JVM-side.

    Replaces ``rdd.zipWithIndex()`` — which pickles every row through
    a Python worker twice (out and back through createDataFrame) —
    with: sort (if requested) → ``monotonically_increasing_id`` (JVM;
    partition id in the upper 31 bits, per-partition sequence in the
    lower 33) → one tiny per-partition count collect → broadcast
    offset join. The data-sized path stays in whole-stage codegen;
    only num_partitions rows reach the driver (zipWithIndex runs the
    same counting job internally). localCheckpoint pins the ids so
    downstream actions don't recompute the sort with a different
    partitioning.
    """
    s = df.orderBy(*order_by) if order_by else df
    s = s.withColumn("_mid", F.monotonically_increasing_id()).localCheckpoint(
        eager=False
    )
    pid = F.shiftrightunsigned(F.col("_mid"), 33).cast("int")
    counts = s.groupBy(pid.alias("_pid")).count().collect()
    offsets, acc = [], 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        acc += r["count"]
    spark = df.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    )
    return (
        s.withColumn("_pid", pid)
        .join(off, "_pid")
        .withColumn(
            idx_col,
            F.col("_off") + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)),
        )
        .drop("_pid", "_off", "_mid")
    )


def with_running_total(
    df: DataFrame,
    value_col: str,
    order_by: list,
    out_col: str = "_cum",
) -> DataFrame:
    """Distributed prefix sum of ``value_col`` in ``order_by`` order
    (inclusive running total) — the TeraSort-shaped generalization of
    :func:`with_global_index` from counts to sums: range-sort, pin
    partition/sequence ids via ``monotonically_increasing_id`` +
    localCheckpoint, collect the P per-partition value totals,
    broadcast cumulative offsets back, and add a WITHIN-PARTITION
    running-sum window (partition key = physical partition id, so the
    window input is ~n/P rows — never a global Window). Pass a
    DECIMAL value column for an order-exact, engine-replayable total;
    ties in ``order_by`` must be broken (total order) for a
    well-defined prefix.
    """
    s = df.orderBy(*order_by).withColumn(
        "_mid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    pid = F.shiftrightunsigned(F.col("_mid"), 33).cast("int")
    totals = (
        s.groupBy(pid.alias("_pid"))
        .agg(F.sum(value_col).alias("_t"))
        .collect()
    )
    spark = df.sparkSession
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
    )

    val_type = dict(zip(s.schema.names, s.schema.fields))[
        value_col
    ].dataType
    # Offsets are CROSS-partition cumulative sums, so they outgrow the
    # input column's type (a decimal(18,2) column's offsets can need
    # far more than 18 digits at the scales this helper targets) —
    # type _off as the widened sum type, and seed the accumulator at 0
    # so the first partition's offset is a real 0, never a null that a
    # silent overflow-null could impersonate.
    import decimal

    if isinstance(val_type, DecimalType):
        off_type = DecimalType(38, val_type.scale)
        zero = decimal.Decimal(0)
    elif isinstance(val_type, (ByteType, ShortType, IntegerType)):
        off_type = LongType()
        zero = 0
    else:  # long / float / double: already the widest of their kind
        off_type = val_type
        zero = 0 if isinstance(val_type, LongType) else 0.0
    offsets, acc = [], zero
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        if r["_t"] is not None:
            acc = acc + r["_t"]
    off_schema = StructType(
        [
            StructField("_pid", IntegerType(), False),
            StructField("_off", off_type, False),
        ]
    )
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, zero)], off_schema)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy("_mid")
    return (
        s.withColumn("_pid", pid)
        .join(off, "_pid")
        .withColumn(
            out_col,
            F.col("_off") + F.sum(value_col).over(w),
        )
        .drop("_pid", "_off", "_mid")
    )


def with_running_max(
    df: DataFrame,
    value_col: str,
    order_by: list,
    out_col: str = "_runmax",
    inclusive: bool = True,
) -> DataFrame:
    """Distributed prefix MAX of ``value_col`` in ``order_by`` order —
    :func:`with_running_total`'s sibling for the order-statistic case
    (e.g. "highest event-time seen so far" for watermark/lateness
    audits): range-sort, pin partition/sequence ids, collect the P
    per-partition maxima, broadcast EXCLUSIVE cross-partition prefix
    maxima back, and take the greatest of that offset and a
    WITHIN-PARTITION running-max window (partition key = physical
    partition id — never a global Window; only P rows reach the
    driver).

    ``inclusive=False`` gives the strict-predecessor running max
    (current row excluded) — NULL for the global first row, exactly
    the "was this row late vs everything before it" semantics.
    ``order_by`` ties must be broken (total order)."""
    s = df.orderBy(*order_by).withColumn(
        "_mid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    pid = F.shiftrightunsigned(F.col("_mid"), 33).cast("int")
    maxima = (
        s.groupBy(pid.alias("_pid"))
        .agg(F.max(value_col).alias("_m"))
        .collect()
    )
    spark = df.sparkSession
    from pyspark.sql.types import IntegerType, StructField, StructType

    val_type = dict(zip(s.schema.names, s.schema.fields))[
        value_col
    ].dataType
    offsets, acc = [], None
    for r in sorted(maxima, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], acc))
        if r["_m"] is not None and (acc is None or r["_m"] > acc):
            acc = r["_m"]
    off_schema = StructType(
        [
            StructField("_pid", IntegerType(), False),
            StructField("_pmax", val_type, True),
        ]
    )
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, None)], off_schema)
    )
    from pyspark.sql import Window

    end = 0 if inclusive else -1
    w = (
        Window.partitionBy("_pid")
        .orderBy("_mid")
        .rowsBetween(Window.unboundedPreceding, end)
    )
    # F.greatest skips NULLs (NULL only when every operand is NULL),
    # which is exactly the boundary semantics needed here
    return (
        s.withColumn("_pid", pid)
        .join(off, "_pid")
        .withColumn(
            out_col, F.greatest(F.max(value_col).over(w), F.col("_pmax"))
        )
        .drop("_pid", "_pmax", "_mid")
    )


def to_ml_df(x: DsArray, y: DsArray | None = None) -> DataFrame:
    """DsArray (+ optional (n,1) label DsArray) → DataFrame with an
    MLlib Vector ``_v`` column (and ``label``). The row_id join
    replaces dislib's _paired_partition zip (utils/base.py:204-215) —
    labels and features co-locate in one DataFrame."""
    from pyspark.ml.functions import array_to_vector

    df = x.df.select(_ROW, array_to_vector(F.col(_FEAT)).alias("_v"))
    if y is not None:
        ydf = y.df.select(
            _ROW, F.element_at(F.col(_FEAT), 1).alias("label")
        )
        df = df.join(ydf, _ROW)
    return df


def prediction_to_dsarray(df: DataFrame, n_rows: int, col: str = "prediction") -> DsArray:
    """(row_id, prediction) → (n,1) DsArray, matching the reference's
    lazy (n,1) predict outputs (e.g. kmeans/base.py:145-166)."""
    out = df.select(
        _ROW, F.array(F.col(col).cast("double")).alias(_FEAT)
    )
    return DsArray(out, (n_rows, 1))


def shuffle(x: DsArray, y: DsArray | None = None, random_state: int = 0):
    """Global row shuffle (reference utils/base.py:11-90): seeded
    random sort (range-partitioned, fully distributed — the same
    scatter dislib's hypergeometric block split hand-rolls) and dense
    JVM-side re-keying (no single-partition window, no Python hop)."""
    if y is not None:
        # co-shuffle features and labels in one pass (same permutation)
        paired = x.df.join(y.df.withColumnRenamed(_FEAT, "_y"), _ROW)
        df = with_global_index(
            paired.select(_FEAT, "_y", F.rand(random_state).alias("_r"), _ROW),
            ["_r", _ROW],
            "_new_row",
        ).select(F.col("_new_row").alias(_ROW), _FEAT, "_y")
        xs = DsArray(df.select(_ROW, _FEAT), x.shape)
        ys = DsArray(df.select(_ROW, F.col("_y").alias(_FEAT)), y.shape)
        return xs, ys
    df = with_global_index(
        x.df.select(_FEAT, F.rand(random_state).alias("_r"), _ROW),
        ["_r", _ROW],
        "_new_row",
    ).select(F.col("_new_row").alias(_ROW), _FEAT)
    return DsArray(df, x.shape)
