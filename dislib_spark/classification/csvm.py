"""Support vector machines.

Reference: ``dislib/classification/csvm/base.py:101-329`` — Cascade
SVM (Graf et al.): train sklearn SVC per partition, keep each
partition's support vectors, pairwise-merge up an ``cascade_arity``
tree, feed the final SV set back for the next iteration; convergence
via Lagrangian delta.

Spark-first: per-partition SVC = ``applyInPandas`` over a salt key
(one Arrow batch per cascade leaf); the merge tree is a driver loop
re-salting the shrinking SV set (each level is one narrow+small
shuffle). Linear kernel alternative: MLlib ``LinearSVC`` (distributed
hinge-loss optimizer) — preferable at 100 TB when a linear boundary
suffices, since the cascade funnels all SVs to one final solve.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW
from dislib_spark.utils.base import prediction_to_dsarray, to_ml_df

def _svc_factory(kernel: str, c: float, gamma, random_state: int):
    """sklearn SVC when available (reference trains sklearn per node,
    csvm/base.py:574-595); otherwise the in-repo SMO solver."""
    try:
        from sklearn.svm import SVC

        return SVC(kernel=kernel, C=c, gamma=gamma, random_state=random_state)
    except ImportError:
        from dislib_spark.classification.smo import SimpleSVC

        return SimpleSVC(kernel=kernel, C=c, gamma=gamma, random_state=random_state)


class CascadeSVM:
    """Cascade SVM (reference classification/csvm/base.py)."""

    def __init__(
        self,
        cascade_arity: int = 2,
        max_iter: int = 5,
        tol: float = 1e-3,
        kernel: str = "rbf",
        c: float = 1.0,
        gamma: str | float = "auto",
        random_state: int = 0,
    ):
        self.cascade_arity = cascade_arity
        self.max_iter = max_iter
        self.tol = tol
        self.kernel = kernel
        self.c = c
        self.gamma = gamma
        self.random_state = random_state
        self._clf = None  # final driver-side SVC over last SV set

    def _partition_svc(self, pdf):
        """Train an SVC on one cascade node's rows, emit its SVs."""
        import pandas as pd

        X = np.array(pdf["x"].tolist())
        y = pdf["y"].to_numpy()
        if len(np.unique(y)) < 2:
            return pdf[["x", "y"]]
        clf = _svc_factory(self.kernel, self.c, self.gamma, self.random_state)
        clf.fit(X, y)
        sv = clf.support_
        return pd.DataFrame({"x": pdf["x"].iloc[sv], "y": pdf["y"].iloc[sv]})

    def fit(self, x: DsArray, y: DsArray) -> "CascadeSVM":
        paired = x.df.join(
            y.df.select(
                _ROW, F.element_at(F.col(_FEAT), 1).alias("y")
            ),
            _ROW,
        ).select(F.col(_FEAT).alias("x"), "y")

        spark = x.spark
        n_parts = max(paired.rdd.getNumPartitions(), 2)
        fn = self._partition_svc

        for _ in range(self.max_iter):
            level = paired.withColumn(
                "node", F.pmod(F.xxhash64(F.to_json(F.struct("x"))), F.lit(n_parts))
            )
            # cascade: filter to SVs per node, then halve node count
            # until one node remains (reference _do_iteration :283-329)
            parts = n_parts
            while parts > 1:
                level = (
                    level.groupBy("node")
                    .applyInPandas(
                        lambda pdf: fn(pdf), "x array<double>, y double"
                    )
                    .withColumn(
                        "node",
                        F.pmod(
                            F.xxhash64(F.to_json(F.struct("x"))),
                            F.lit(max(parts // self.cascade_arity, 1)),
                        ),
                    )
                )
                parts = max(parts // self.cascade_arity, 1)
            # final node: collect SVs (small by construction) and refit
            svs = level.select("x", "y").collect()
            paired = spark.createDataFrame(
                [(r["x"], r["y"]) for r in svs], "x array<double>, y double"
            )
        X = np.array([r["x"] for r in svs])
        yv = np.array([r["y"] for r in svs])
        self._clf = _svc_factory(
            self.kernel, self.c, self.gamma, self.random_state
        )
        self._clf.fit(X, yv)
        return self

    def predict(self, x: DsArray) -> DsArray:
        import pandas as pd

        clf = self._clf

        def run(batches):
            for pdf in batches:
                X = np.array(pdf[_FEAT].tolist())
                yield pd.DataFrame(
                    {_ROW: pdf[_ROW], "prediction": clf.predict(X)}
                )

        pred = x.df.mapInPandas(run, f"{_ROW} long, prediction double")
        return prediction_to_dsarray(pred, x.shape[0])

    def score(self, x: DsArray, y: DsArray) -> float:
        pred = self.predict(x)
        joined = pred.df.join(y.df.withColumnRenamed(_FEAT, "_y"), _ROW)
        acc = joined.select(
            F.avg(
                (F.element_at(_FEAT, 1) == F.element_at("_y", 1)).cast("double")
            ).alias("acc")
        ).collect()[0]["acc"]
        return float(acc)


class LinearSVC:
    """MLlib LinearSVC adapter — the linear-kernel scale path
    (SURVEY.md §2.9 CascadeSVM row)."""

    def __init__(self, c: float = 1.0, max_iter: int = 100, tol: float = 1e-6):
        self.c = c
        self.max_iter = max_iter
        self.tol = tol
        self.model = None

    def fit(self, x: DsArray, y: DsArray) -> "LinearSVC":
        from pyspark.ml.classification import LinearSVC as ML

        df = to_ml_df(x, y)
        self.model = ML(
            regParam=1.0 / self.c,
            maxIter=self.max_iter,
            tol=self.tol,
            featuresCol="_v",
            labelCol="label",
        ).fit(df)
        return self

    def predict(self, x: DsArray) -> DsArray:
        pred = self.model.transform(to_ml_df(x)).select(_ROW, "prediction")
        return prediction_to_dsarray(pred, x.shape[0])
