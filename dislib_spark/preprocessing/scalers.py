"""Feature scalers with inverse transforms.

Reference: ``dislib/preprocessing/standard_scaler.py:38-135`` (mean +
population variance, ddof=0) and ``minmax_scaler.py:31-129``.

Spark-first: fit is ONE global aggregation (map-side partials); the
transform/inverse are narrow column maps — no MLlib model objects, so
the inverse transform the reference has and MLlib lacks is trivial.
Works both on raw DataFrame columns and on DsArray feature vectors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column mean / population std / min / max in ONE pass.
    Returns one row per column: (col_name, mean, std_pop, cmin, cmax).

    All columns' aggregates ride a single scan+aggregate (previously
    one unioned scan per column — d scans of the fact table); the
    packed 1-row result explodes into the per-column rows. Same
    aggregate functions over the same scan partitioning, so the float
    values are bit-identical to the per-column form."""
    aggs = []
    for c in cols:
        aggs += [
            F.round(F.avg(c), 6).alias(f"_m_{c}"),
            F.round(F.stddev_pop(c), 6).alias(f"_s_{c}"),
            F.round(F.min(c).cast("double"), 6).alias(f"_lo_{c}"),
            F.round(F.max(c).cast("double"), 6).alias(f"_hi_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"_m_{c}").alias("mean"),
            F.col(f"_s_{c}").alias("std_pop"),
            F.col(f"_lo_{c}").alias("cmin"),
            F.col(f"_hi_{c}").alias("cmax"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("_st")).select(
        "_st.*"
    )


class StandardScaler:
    """(x - μ) / σ with exact inverse (reference
    standard_scaler.py:38-135; variance ddof=0 per ``_compute_var``
    :279-299)."""

    def __init__(self):
        self.mean_: np.ndarray | None = None
        self.scale_: np.ndarray | None = None

    def fit(self, x: DsArray) -> "StandardScaler":
        d = x.shape[1]
        exprs = []
        for j in range(d):
            e = F.element_at(F.col(_FEAT), j + 1)
            exprs.append(F.avg(e).alias(f"m{j}"))
            exprs.append(F.stddev_pop(e).alias(f"s{j}"))
        row = x.df.agg(*exprs).collect()[0]
        self.mean_ = np.array([row[f"m{j}"] for j in range(d)])
        self.scale_ = np.array([row[f"s{j}"] or 0.0 for j in range(d)])
        # zero-variance columns pass through (sklearn convention)
        self.scale_[self.scale_ == 0.0] = 1.0
        return self

    def transform(self, x: DsArray) -> DsArray:
        mu, sg = self.mean_, self.scale_
        cols = [
            (F.element_at(F.col(_FEAT), j + 1) - F.lit(float(mu[j])))
            / F.lit(float(sg[j]))
            for j in range(x.shape[1])
        ]
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, x.shape)

    def fit_transform(self, x: DsArray) -> DsArray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x: DsArray) -> DsArray:
        mu, sg = self.mean_, self.scale_
        cols = [
            F.element_at(F.col(_FEAT), j + 1) * F.lit(float(sg[j]))
            + F.lit(float(mu[j]))
            for j in range(x.shape[1])
        ]
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, x.shape)


class RobustScaler:
    """(x - median) / IQR with exact inverse — the outlier-resistant
    scaler (sklearn RobustScaler contract: center = median, scale =
    q75 - q25). Extension beyond the reference's mean/minmax scalers;
    same fit shape: ONE aggregation of exact percentiles (the 100 TB
    path swaps ``approx_percentile`` behind the same attributes)."""

    def __init__(self, quantile_range: tuple[float, float] = (0.25, 0.75)):
        self.quantile_range = quantile_range
        self.center_: np.ndarray | None = None
        self.scale_: np.ndarray | None = None

    def fit(self, x: DsArray) -> "RobustScaler":
        d = x.shape[1]
        lo, hi = self.quantile_range
        exprs = []
        for j in range(d):
            # one array-percentile per dim: a single sort/buffer
            # yields (lo, median, hi) together
            exprs.append(
                F.expr(
                    f"percentile({_FEAT}[{j}], array({lo}, 0.5, {hi}))"
                ).alias(f"p{j}")
            )
        row = x.df.agg(*exprs).collect()[0]
        self.center_ = np.array([row[f"p{j}"][1] for j in range(d)])
        self.scale_ = np.array(
            [(row[f"p{j}"][2] - row[f"p{j}"][0]) or 0.0 for j in range(d)]
        )
        self.scale_[self.scale_ == 0.0] = 1.0
        return self

    def transform(self, x: DsArray) -> DsArray:
        ce, sc = self.center_, self.scale_
        cols = [
            (F.element_at(F.col(_FEAT), j + 1) - F.lit(float(ce[j])))
            / F.lit(float(sc[j]))
            for j in range(x.shape[1])
        ]
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, x.shape)

    def fit_transform(self, x: DsArray) -> DsArray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x: DsArray) -> DsArray:
        ce, sc = self.center_, self.scale_
        cols = [
            F.element_at(F.col(_FEAT), j + 1) * F.lit(float(sc[j]))
            + F.lit(float(ce[j]))
            for j in range(x.shape[1])
        ]
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, x.shape)


class MinMaxScaler:
    """Scale to [lo, hi] with exact inverse (reference
    minmax_scaler.py:31-129)."""

    def __init__(self, feature_range: tuple[float, float] = (0.0, 1.0)):
        self.feature_range = feature_range
        self.data_min_: np.ndarray | None = None
        self.data_max_: np.ndarray | None = None

    def fit(self, x: DsArray) -> "MinMaxScaler":
        d = x.shape[1]
        exprs = []
        for j in range(d):
            e = F.element_at(F.col(_FEAT), j + 1)
            exprs.append(F.min(e).alias(f"mn{j}"))
            exprs.append(F.max(e).alias(f"mx{j}"))
        row = x.df.agg(*exprs).collect()[0]
        self.data_min_ = np.array([row[f"mn{j}"] for j in range(d)])
        self.data_max_ = np.array([row[f"mx{j}"] for j in range(d)])
        return self

    def transform(self, x: DsArray) -> DsArray:
        lo, hi = self.feature_range
        mn, mx = self.data_min_, self.data_max_
        rng = np.where(mx - mn == 0.0, 1.0, mx - mn)
        cols = [
            (F.element_at(F.col(_FEAT), j + 1) - F.lit(float(mn[j])))
            / F.lit(float(rng[j]))
            * F.lit(hi - lo)
            + F.lit(lo)
            for j in range(x.shape[1])
        ]
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, x.shape)

    def fit_transform(self, x: DsArray) -> DsArray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x: DsArray) -> DsArray:
        lo, hi = self.feature_range
        mn, mx = self.data_min_, self.data_max_
        rng = np.where(mx - mn == 0.0, 1.0, mx - mn)
        cols = [
            (F.element_at(F.col(_FEAT), j + 1) - F.lit(lo))
            / F.lit(hi - lo)
            * F.lit(float(rng[j]))
            + F.lit(float(mn[j]))
            for j in range(x.shape[1])
        ]
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, x.shape)
