"""Shared estimator plumbing + utils.shuffle / label helpers.

Reference: ``dislib/utils/base.py`` (shuffle :11-90, _paired_partition
:204-215).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


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
    re-keying via zipWithIndex (no single-partition window)."""
    spark = x.spark
    if y is not None:
        # co-shuffle features and labels in one pass (same permutation)
        paired = x.df.join(
            y.df.withColumnRenamed(_FEAT, "_y"), _ROW
        )
        rdd = (
            paired.orderBy(F.rand(random_state), F.col(_ROW))
            .rdd.zipWithIndex()
            .map(lambda t: (t[1], t[0][_FEAT], t[0]["_y"]))
        )
        df = spark.createDataFrame(
            rdd, f"{_ROW} long, {_FEAT} array<double>, _y array<double>"
        )
        xs = DsArray(df.select(_ROW, _FEAT), x.shape)
        ys = DsArray(df.select(_ROW, F.col("_y").alias(_FEAT)), y.shape)
        return xs, ys
    rdd = (
        x.df.orderBy(F.rand(random_state), F.col(_ROW))
        .rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0][_FEAT]))
    )
    df = spark.createDataFrame(rdd, f"{_ROW} long, {_FEAT} array<double>")
    return DsArray(df, x.shape)
