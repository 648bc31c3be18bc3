"""Data splitting for model selection.

Reference: ``dislib/model_selection/_split.py`` —
``train_test_split`` (:14-75), ``KFold`` (:104-194).

Spark-first: splits are hash/random predicates over row_id — no data
movement at split time (each fold is a filtered view of the same
cached plan), versus the reference's physical block re-slicing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW
from dislib_spark.utils.base import with_global_index


def _renumber(df, shape):
    """Compact row ids after a filter (keeps DsArray contract),
    JVM-side via utils.base.with_global_index."""
    out = with_global_index(df.select(_ROW, _FEAT), [_ROW], "_new").select(
        F.col("_new").alias(_ROW), _FEAT
    )
    return DsArray(out, shape)


def train_test_split(
    x: DsArray,
    y: DsArray | None = None,
    test_size: float = 0.25,
    random_state: int = 0,
):
    """Seeded random split (reference _split.py:14-75). The split
    predicate is a deterministic per-row hash — both sides derive
    from one plan, no shuffle."""
    frac = 1.0 - test_size
    # deterministic per-row uniform from (seed, row_id)
    u = F.pmod(F.xxhash64(F.col(_ROW) + F.lit(random_state * 2654435761)), F.lit(1 << 20)) / F.lit(float(1 << 20))
    xdf = x.df.withColumn("_u", u)
    train_df = xdf.where(F.col("_u") < frac).drop("_u")
    test_df = xdf.where(F.col("_u") >= frac).drop("_u")
    n_train = train_df.count()
    n_test = x.shape[0] - n_train
    x_train = _renumber(train_df, (n_train, x.shape[1]))
    x_test = _renumber(test_df, (n_test, x.shape[1]))
    if y is None:
        return x_train, x_test
    ydf = y.df.withColumn("_u", u)
    y_train = _renumber(ydf.where(F.col("_u") < frac).drop("_u"), (n_train, y.shape[1]))
    y_test = _renumber(ydf.where(F.col("_u") >= frac).drop("_u"), (n_test, y.shape[1]))
    return x_train, x_test, y_train, y_test


class KFold:
    """k contiguous (or seeded-shuffled) folds (reference
    _split.py:104-194). Folds are filter views keyed by
    ``pmod(hash(row_id), k)`` (shuffled) or row ranges (contiguous)."""

    def __init__(self, n_splits: int = 5, shuffle: bool = False, random_state: int = 0):
        self.n_splits = n_splits
        self.shuffle = shuffle
        self.random_state = random_state

    def split(self, x: DsArray, y: DsArray | None = None):
        n = x.shape[0]
        for fold in range(self.n_splits):
            if self.shuffle:
                key = F.pmod(
                    F.xxhash64(F.col(_ROW) + F.lit(self.random_state)),
                    F.lit(self.n_splits),
                )
                test_pred = key == fold
            else:
                lo = fold * n // self.n_splits
                hi = (fold + 1) * n // self.n_splits
                test_pred = (F.col(_ROW) >= lo) & (F.col(_ROW) < hi)

            test_df = x.df.where(test_pred)
            train_df = x.df.where(~test_pred)
            n_test = test_df.count()
            x_test = _renumber(test_df, (n_test, x.shape[1]))
            x_train = _renumber(train_df, (n - n_test, x.shape[1]))
            if y is None:
                yield x_train, x_test
            else:
                y_test = _renumber(y.df.where(test_pred), (n_test, y.shape[1]))
                y_train = _renumber(
                    y.df.where(~test_pred), (n - n_test, y.shape[1])
                )
                yield (x_train, y_train), (x_test, y_test)
