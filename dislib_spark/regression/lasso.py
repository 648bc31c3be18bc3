"""L1-regularized regression.

Reference: ``dislib/regression/lasso/base.py:27-136`` — Lasso solved
by distributed consensus ADMM with per-partition cvxpy prox steps.

Spark-first: same optimum via MLlib ``LinearRegression`` with
``elasticNetParam=1.0`` (OWL-QN) — the SURVEY §2.9 mapping: identical
minimizer, production optimizer, no cvxpy-on-executors dependency.
The generic ADMM loop survives separately in
``dislib_spark.optimization.admm`` for arbitrary losses.
"""

from __future__ import annotations

import numpy as np

from dislib_spark.array.core import DsArray, _FEAT, _ROW
from dislib_spark.utils.base import prediction_to_dsarray, to_ml_df


class Lasso:
    """sklearn-style facade (reference regression/lasso/base.py)."""

    def __init__(self, lmbd: float = 1e-3, max_iter: int = 100, tol: float = 1e-6):
        self.lmbd = lmbd
        self.max_iter = max_iter
        self.tol = tol
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0
        self.model = None

    def fit(self, x: DsArray, y: DsArray) -> "Lasso":
        from pyspark.ml.regression import LinearRegression as ML

        df = to_ml_df(x, y)
        lr = ML(
            elasticNetParam=1.0,
            regParam=self.lmbd,
            maxIter=self.max_iter,
            tol=self.tol,
            featuresCol="_v",
            labelCol="label",
        )
        self.model = lr.fit(df)
        self.coef_ = np.array(self.model.coefficients)
        self.intercept_ = float(self.model.intercept)
        return self

    def predict(self, x: DsArray) -> DsArray:
        pred = self.model.transform(to_ml_df(x)).select(_ROW, "prediction")
        return prediction_to_dsarray(pred, x.shape[0])

    def fit_predict(self, x: DsArray, y: DsArray) -> DsArray:
        return self.fit(x, y).predict(x)
