"""Alternating least squares collaborative filtering.

Reference: ``dislib/recommendation/als/base.py:82-220`` — Zhou et al.
weighted-λ ALS over a sparse ratings matrix, alternating per-block
normal-equation solves for user and item factors.

Spark-first: MLlib ``ALS`` is the same algorithm (block-to-block
factor exchange, normal equations per user/item) with production
partitioning (blockify + in-block solve). The adapter maps the
reference's (n_f, lambda_, max_iter) and exposes RMSE scoring via the
predictions join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ALS:
    """sklearn-style facade (reference recommendation/als/base.py:30-82
    constructor params)."""

    def __init__(
        self,
        max_iter: int = 10,
        tol: float = 1e-4,
        n_f: int = 100,
        lambda_: float = 0.065,
        random_state: int = 0,
    ):
        self.max_iter = max_iter
        self.tol = tol
        self.n_f = n_f
        self.lambda_ = lambda_
        self.random_state = random_state
        self.model = None

    def fit(
        self,
        ratings: DataFrame,
        user_col: str = "user_id",
        item_col: str = "item_id",
        rating_col: str = "rating",
    ) -> "ALS":
        from pyspark.ml.recommendation import ALS as MLALS

        self._cols = (user_col, item_col, rating_col)
        als = MLALS(
            rank=self.n_f,
            maxIter=self.max_iter,
            regParam=self.lambda_,
            seed=self.random_state,
            userCol=user_col,
            itemCol=item_col,
            ratingCol=rating_col,
            coldStartStrategy="drop",
            nonnegative=False,
        )
        self.model = als.fit(ratings)
        return self

    def predict(self, pairs: DataFrame) -> DataFrame:
        """(user, item) pairs → predicted ratings."""
        return self.model.transform(pairs)

    def score(self, ratings: DataFrame) -> float:
        """Negative RMSE on held-out ratings (higher is better,
        mirroring the reference's test usage)."""
        user_col, item_col, rating_col = self._cols
        pred = self.model.transform(ratings)
        row = pred.agg(
            F.avg((F.col(rating_col) - F.col("prediction")) ** 2).alias("mse")
        ).collect()[0]
        return -math.sqrt(row["mse"])
