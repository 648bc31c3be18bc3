"""Linear regression (OLS via distributed normal equations).

Reference: ``dislib/regression/linear/base.py:70-135`` — computes
Z'Z and Z'y as per-block partials tree-merged with arity, then solves
locally (``:329-337``).

Spark-first: the Gramian partials ARE Spark's partial aggregation —
we emit the (d+1)² upper-triangle sums as agg expressions in ONE pass
(map-side combine, one tiny shuffle of the partial vector), then
solve the (d+1)×(d+1) system on the driver. No MLlib needed, no
iteration, exact same math as the reference.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray


def ols_fit(df: DataFrame, x_cols: list[str], y_col: str,
            fit_intercept: bool = True) -> tuple[np.ndarray, float]:
    """Solve min ||Xw + b - y||² via normal equations in one
    distributed pass. Returns (coef vector, intercept).

    d ≤ 16: pure-JVM agg expressions (d² sums, whole-stage codegen).
    d > 16: Arrow-batched packed Gramian partials (wide expression
    sets trigger quadratic codegen — same lesson as PCA.fit).
    """
    d = len(x_cols)
    if d > 16:
        return _ols_fit_wide(df, x_cols, y_col, fit_intercept)
    cols = [F.col(c).cast("double") for c in x_cols]
    y = F.col(y_col).cast("double")

    exprs = [F.count(F.lit(1)).alias("n")]
    for i in range(d):
        exprs.append(F.sum(cols[i]).alias(f"sx_{i}"))
        exprs.append(F.sum(cols[i] * y).alias(f"sxy_{i}"))
        for j in range(i, d):
            exprs.append(F.sum(cols[i] * cols[j]).alias(f"sxx_{i}_{j}"))
    exprs.append(F.sum(y).alias("sy"))
    row = df.agg(*exprs).collect()[0]

    n = float(row["n"])
    if fit_intercept:
        # Z = [X, 1]: assemble Z'Z and Z'y from the sums
        ztz = np.zeros((d + 1, d + 1))
        zty = np.zeros(d + 1)
        for i in range(d):
            for j in range(i, d):
                ztz[i, j] = ztz[j, i] = row[f"sxx_{i}_{j}"]
            ztz[i, d] = ztz[d, i] = row[f"sx_{i}"]
            zty[i] = row[f"sxy_{i}"]
        ztz[d, d] = n
        zty[d] = row["sy"]
        w = np.linalg.solve(ztz, zty)
        return w[:d], float(w[d])
    ztz = np.zeros((d, d))
    zty = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            ztz[i, j] = ztz[j, i] = row[f"sxx_{i}_{j}"]
        zty[i] = row[f"sxy_{i}"]
    w = np.linalg.solve(ztz, zty)
    return w, 0.0


def _ols_fit_wide(df: DataFrame, x_cols: list[str], y_col: str,
                  fit_intercept: bool) -> tuple[np.ndarray, float]:
    """Packed Z'Z / Z'y partials per Arrow batch (Z = [X, 1] when
    fitting the intercept), merged by posexplode + idx-grouped sum —
    the reference's Gramian tree (regression/linear/base.py:274-327)
    with Arrow batches as the leaves."""
    import pandas as pd

    d = len(x_cols)
    dz = d + 1 if fit_intercept else d
    n_triu = dz * (dz + 1) // 2

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = pdf[x_cols].to_numpy(dtype=np.float64)
            yv = pdf[y_col].to_numpy(dtype=np.float64)
            Z = np.hstack([X, np.ones((len(X), 1))]) if fit_intercept else X
            vec = np.concatenate(
                [(Z.T @ Z)[np.triu_indices(dz)], Z.T @ yv]
            )
            yield pd.DataFrame({"partial": [vec.tolist()]})

    pdf = df.select(*x_cols, y_col).mapInPandas(partials, "partial array<double>")
    summed = (
        pdf.select(F.posexplode("partial").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    vec = np.zeros(n_triu + dz)
    for r in summed:
        vec[r["idx"]] = r["s"]
    ztz = np.zeros((dz, dz))
    iu = np.triu_indices(dz)
    ztz[iu] = vec[:n_triu]
    ztz.T[iu] = vec[:n_triu]
    zty = vec[n_triu:]
    w = np.linalg.solve(ztz, zty)
    if fit_intercept:
        return w[:d], float(w[d])
    return w, 0.0


class LinearRegression:
    """sklearn-style facade (reference regression/linear/base.py:70).

    ``fit`` accepts a DsArray pair (x, y) or a DataFrame with
    feature/label columns.
    """

    def __init__(self, fit_intercept: bool = True):
        self.fit_intercept = fit_intercept
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0

    def fit(self, x, y=None, x_cols=None, y_col=None):
        if isinstance(x, DsArray):
            df = _dsarray_pair_to_df(x, y)
            x_cols = [f"x{j}" for j in range(x.shape[1])]
            y_col = "y"
        else:
            df = x
        self.coef_, self.intercept_ = ols_fit(
            df, x_cols, y_col, self.fit_intercept
        )
        return self

    def predict(self, x: DsArray) -> DsArray:
        from dislib_spark.array.core import _FEAT, _ROW

        coef = self.coef_
        expr = F.lit(float(self.intercept_))
        for j, w in enumerate(coef):
            expr = expr + F.element_at(F.col(_FEAT), j + 1) * F.lit(float(w))
        df = x.df.select(_ROW, F.array(expr).alias(_FEAT))
        return DsArray(df, (x.shape[0], 1))


def _dsarray_pair_to_df(x: DsArray, y: DsArray) -> DataFrame:
    """Co-locate features and labels in one DataFrame (replaces the
    reference's _paired_partition, utils/base.py:204)."""
    from dislib_spark.array.core import _FEAT, _ROW

    xdf = x.df
    ydf = y.df.select(
        F.col(_ROW), F.element_at(F.col(_FEAT), 1).alias("y")
    )
    joined = xdf.join(ydf, _ROW)
    cols = [
        F.element_at(F.col(_FEAT), j + 1).alias(f"x{j}")
        for j in range(x.shape[1])
    ]
    return joined.select(F.col(_ROW), *cols, F.col("y"))
