"""Isotonic-regression score calibration.

Extension beyond the reference's regression surface (linear/lasso):
the standard post-hoc calibrator for a binary scorer — fit a
monotonic step function score → P(y=1) by pool-adjacent-violators.
Backed by MLlib's distributed IsotonicRegression (parallel PAV over
sorted partitions, merged on the driver), so the fit is one sort +
one pass at any scale; ``transform`` is a JVM-side model application
(piecewise-linear interpolation between boundaries).

Complements m14's reliability bins: bins DIAGNOSE miscalibration,
this FIXES it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IsotonicCalibrator:
    """Fit a monotone calibration map on (score, label) columns.

    After ``fit``, ``boundaries_``/``predictions_`` hold the PAV step
    function (sklearn ``IsotonicRegression`` parity is pytest-gated);
    ``transform`` appends ``calibrated`` via the JVM model.
    """

    def __init__(self, isotonic: bool = True):
        self.isotonic = isotonic
        self._model = None
        self.boundaries_: np.ndarray | None = None
        self.predictions_: np.ndarray | None = None

    def fit(
        self,
        df: DataFrame,
        score_col: str = "score",
        label_col: str = "y",
    ) -> "IsotonicCalibrator":
        from pyspark.ml.functions import array_to_vector
        from pyspark.ml.regression import IsotonicRegression

        data = df.select(
            array_to_vector(
                F.array(F.col(score_col).cast("double"))
            ).alias("features"),
            F.col(label_col).cast("double").alias("label"),
        )
        ir = IsotonicRegression(isotonic=self.isotonic)
        self._model = ir.fit(data)
        self.boundaries_ = np.array(self._model.boundaries.toArray())
        self.predictions_ = np.array(self._model.predictions.toArray())
        return self

    def transform(
        self, df: DataFrame, score_col: str = "score"
    ) -> DataFrame:
        """Append ``calibrated`` — piecewise-linear interpolation of
        the fitted step function, evaluated JVM-side."""
        if self._model is None:
            raise RuntimeError("fit before transform")
        from pyspark.ml.functions import array_to_vector

        staged = df.withColumn(
            "__feat",
            array_to_vector(F.array(F.col(score_col).cast("double"))),
        )
        out = (
            self._model.setFeaturesCol("__feat")
            .setPredictionCol("calibrated")
            .transform(staged)
        )
        return out.drop("__feat")
