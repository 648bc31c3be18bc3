"""Distributed logistic regression.

Not in the reference (its classifiers are CascadeSVM, kNN, RF) but a
first-class training-pipeline need: the trainable quality/topic
classifier (fastText-style gates, DSIR-style domain scorers) that NB
(``classification.MultinomialNB``) approximates generatively. Backed
by MLlib's L-BFGS/OWL-QN ``LogisticRegression`` — the distributed
gradient aggregation whose single-step kernel is oracle-checked as
m10 (``queries/ml.py`` m10_logreg_grad); elastic-net regularization
maps (reg_lambda, l1_ratio) → (regParam, elasticNetParam).

Same DsArray fit/predict/score surface as the other estimators;
features stay JVM-side (array → MLlib vector via array_to_vector, no
Python row hops).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.array.core import _FEAT, _ROW, DsArray
from dislib_spark.utils.base import prediction_to_dsarray, to_ml_df


class LogisticRegression:
    """Binary / multinomial logistic regression (MLlib backend).

    Parameters mirror the sklearn/reference conventions:
    ``reg_lambda`` is the total regularization strength (0 = none),
    ``l1_ratio`` the elastic-net mix (0 = ridge, 1 = lasso),
    ``fit_intercept`` as usual.
    """

    def __init__(
        self,
        max_iter: int = 100,
        reg_lambda: float = 0.0,
        l1_ratio: float = 0.0,
        fit_intercept: bool = True,
        tol: float = 1e-6,
    ):
        self.max_iter = max_iter
        self.reg_lambda = reg_lambda
        self.l1_ratio = l1_ratio
        self.fit_intercept = fit_intercept
        self.tol = tol
        self._ml_model = None

    def fit(self, x: DsArray, y: DsArray) -> "LogisticRegression":
        from pyspark.ml.classification import LogisticRegression as C

        df = to_ml_df(x, y)
        self._ml_model = C(
            maxIter=self.max_iter,
            regParam=self.reg_lambda,
            elasticNetParam=self.l1_ratio,
            fitIntercept=self.fit_intercept,
            tol=self.tol,
            featuresCol="_v",
            labelCol="label",
        ).fit(df)
        self.coef_ = np.array(self._ml_model.coefficientMatrix.toArray())
        self.intercept_ = np.array(self._ml_model.interceptVector.toArray())
        return self

    def predict(self, x: DsArray) -> DsArray:
        pred = self._ml_model.transform(to_ml_df(x)).select(
            _ROW, "prediction"
        )
        return prediction_to_dsarray(pred, x.shape[0])

    def predict_proba(self, x: DsArray) -> DsArray:
        """(n, n_classes) class-probability array."""
        from pyspark.ml.functions import vector_to_array

        out = self._ml_model.transform(to_ml_df(x)).select(
            _ROW, vector_to_array(F.col("probability")).alias(_FEAT)
        )
        n_classes = self._ml_model.numClasses
        return DsArray(out, (x.shape[0], n_classes))

    def score(self, x: DsArray, y: DsArray) -> float:
        pred = self.predict(x)
        joined = pred.df.join(
            y.df.select(
                _ROW, F.element_at(F.col(_FEAT), 1).alias("_y")
            ),
            _ROW,
        )
        hits = joined.agg(
            F.avg(
                (F.element_at(F.col(_FEAT), 1) == F.col("_y")).cast(
                    "double"
                )
            )
        ).collect()[0][0]
        return float(hits)
