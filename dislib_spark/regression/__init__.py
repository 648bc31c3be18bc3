from dislib_spark.regression.linear import LinearRegression, ols_fit
from dislib_spark.regression.lasso import Lasso

__all__ = ["LinearRegression", "ols_fit", "Lasso"]
