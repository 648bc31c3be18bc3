"""Decision trees and random forests.

Reference: ``dislib/trees/forest.py:31-157`` (front-end),
``trees/distributed/decision_tree.py:600-744`` (distributed split
search with terasort bucketing). ~8.6k LoC there; Spark's MLlib RF
*is* that distributed-split design (binned feature search, per-node
partial aggregation), so the adapter is thin. ``hard_vote`` —
majority over per-tree predictions instead of probability averaging
(``forest.py:294-577``) — MLlib lacks; implemented via per-tree
transforms + mode aggregation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW
from dislib_spark.utils.base import prediction_to_dsarray, to_ml_df


class _ForestBase:
    _ml_cls = None
    _extra: dict = {}

    def __init__(
        self,
        n_estimators: int = 10,
        try_features: str = "sqrt",
        max_depth: int | None = None,
        random_state: int = 0,
    ):
        self.n_estimators = n_estimators
        self.try_features = try_features
        self.max_depth = max_depth
        self.random_state = random_state
        self.model = None

    def _make(self):
        strategy = {
            "sqrt": "sqrt",
            "third": "onethird",
            None: "all",
        }.get(self.try_features, str(self.try_features))
        kwargs = dict(
            numTrees=self.n_estimators,
            featureSubsetStrategy=strategy,
            maxDepth=min(self.max_depth or 30, 30),
            seed=self.random_state,
            featuresCol="_v",
            labelCol="label",
        )
        kwargs.update(self._extra)
        return self._ml_cls(**kwargs)

    def fit(self, x: DsArray, y: DsArray):
        df = to_ml_df(x, y)
        self.model = self._make().fit(df)
        return self

    def predict(self, x: DsArray) -> DsArray:
        df = to_ml_df(x)
        pred = self.model.transform(df).select(_ROW, "prediction")
        return prediction_to_dsarray(pred, x.shape[0])

    def score(self, x: DsArray, y: DsArray) -> float:
        pred = self.predict(x)
        joined = pred.df.join(
            y.df.withColumnRenamed(_FEAT, "_y"), _ROW
        )
        return self._score_df(joined)


class RandomForestClassifier(_ForestBase):
    """reference trees/forest.py:294-577. ``hard_vote=True`` matches
    the reference's majority-of-tree-predictions mode."""

    def __init__(self, *args, hard_vote: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.hard_vote = hard_vote
        from pyspark.ml.classification import RandomForestClassifier as C

        self._ml_cls = C

    def predict(self, x: DsArray) -> DsArray:
        if not self.hard_vote:
            return super().predict(x)
        # hard vote: mode over individual tree predictions
        df = to_ml_df(x).cache()
        try:
            votes = None
            for t, tree in enumerate(self.model.trees):
                p = tree.transform(df).select(
                    _ROW, F.col("prediction").alias(f"p{t}")
                )
                votes = p if votes is None else votes.join(p, _ROW)
            arr = F.array(
                *[F.col(f"p{t}") for t in range(len(self.model.trees))]
            )
            # mode = most frequent value, ties to smallest
            mode = F.expr(
                "array_sort(transform(array_distinct(_votes), v -> "
                "struct(-size(filter(_votes, x -> x = v)) as neg, v as val)))[0].val"
            )
            pred = votes.withColumn("_votes", arr).select(
                _ROW, mode.alias("prediction")
            )
            return prediction_to_dsarray(pred, x.shape[0])
        finally:
            df.unpersist()

    def _score_df(self, joined) -> float:
        ok = joined.select(
            F.avg(
                (
                    F.element_at(_FEAT, 1) == F.element_at("_y", 1)
                ).cast("double")
            ).alias("acc")
        ).collect()[0]
        return float(ok["acc"])


class RandomForestRegressor(_ForestBase):
    """reference trees/forest.py:579-."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        from pyspark.ml.regression import RandomForestRegressor as R

        self._ml_cls = R

    def _score_df(self, joined) -> float:
        # R² score like the reference regressor
        row = joined.select(
            F.avg(F.element_at("_y", 1)).alias("ybar")
        ).collect()[0]
        ybar = row["ybar"]
        stats = joined.select(
            F.sum(
                (F.element_at("_y", 1) - F.element_at(_FEAT, 1)) ** 2
            ).alias("ss_res"),
            F.sum((F.element_at("_y", 1) - F.lit(ybar)) ** 2).alias("ss_tot"),
        ).collect()[0]
        return 1.0 - stats["ss_res"] / stats["ss_tot"]


class DecisionTreeClassifier(RandomForestClassifier):
    """Single tree (reference trees front-end dispatch
    forest.py:31-157): a 1-tree forest with all features."""

    def __init__(self, max_depth: int | None = None, random_state: int = 0):
        super().__init__(
            n_estimators=1,
            try_features=None,
            max_depth=max_depth,
            random_state=random_state,
        )
        self._extra = {"bootstrap": False}


class DecisionTreeRegressor(RandomForestRegressor):
    def __init__(self, max_depth: int | None = None, random_state: int = 0):
        super().__init__(
            n_estimators=1,
            try_features=None,
            max_depth=max_depth,
            random_state=random_state,
        )
        self._extra = {"bootstrap": False}
