from dislib_spark.regression.linear import LinearRegression, ols_fit
from dislib_spark.regression.lasso import Lasso
from dislib_spark.regression.isotonic import IsotonicCalibrator

__all__ = ["IsotonicCalibrator", "LinearRegression", "ols_fit", "Lasso"]
