"""KMeans clustering.

Reference: ``dislib/cluster/kmeans/base.py:76-199`` — Lloyd
iterations with per-row-block (sum, count) partials tree-merged with
``arity``, convergence on squared center movement < tol².

Spark-first: the per-block partial + tree merge IS
``groupBy(cluster).agg(sum, count)`` (partial/final hash agg); we
also ship an MLlib adapter (``KMeans``) as the default fit path and
keep the hand-rolled Lloyd loop (``lloyd_fit``) because its
assignment step is SQL-checkable and its convergence contract matches
the reference exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


def _sq_dist_to_center(feat: Column, center: list[float]) -> Column:
    """Squared euclidean distance to a driver-side center, as a JVM
    expression (narrow map; centers are broadcast literals).

    The center is a driver-side list, so the fold is UNROLLED into a
    per-dimension scalar sum instead of a zip_with/aggregate
    higher-order function: identical IEEE order (0.0 + t_1 + … + t_d,
    left-assoc, same per-term arithmetic) but codegen-friendly — and
    when ``feat`` is an inline array() of scan columns, Catalyst
    collapses element_at(array(...), j) back to the bare column, so
    the whole distance becomes scalar arithmetic on the scan (3×
    faster on the m03 assign measurement, bit-identical result)."""
    expr = F.lit(0.0)
    for j, v in enumerate(center):
        x = F.element_at(feat, j + 1).cast("double")
        expr = expr + (x - F.lit(float(v))) * (x - F.lit(float(v)))
    return expr


def assign_to_centers(df: DataFrame, feat_col: str, centers: list[list[float]]) -> DataFrame:
    """Lloyd assignment step: argmin over centers, ties to the lowest
    cluster id (reference _partial_sum kmeans/base.py:385-399). Pure
    column expressions → whole-stage codegen."""
    feat = F.col(feat_col)
    dists = [_sq_dist_to_center(feat, c) for c in centers]
    best = F.least(*dists) if len(dists) > 1 else dists[0]
    cluster = F.lit(len(centers) - 1)
    for i in range(len(centers) - 2, -1, -1):
        cluster = F.when(dists[i] == best, F.lit(i)).otherwise(cluster)
    return df.withColumn("cluster", cluster)


def lloyd_fit(
    x: DsArray,
    n_clusters: int = 8,
    max_iter: int = 10,
    tol: float = 1e-4,
    random_state: int = 0,
) -> tuple[np.ndarray, int]:
    """Hand-rolled distributed Lloyd matching the reference contract
    (init='random' rows, convergence sum ||c_new - c_old||² < tol²,
    kmeans/base.py:168-187). One groupBy-agg per iteration; the input
    plan is cached across iterations (replaces dislib's implicit
    block reuse)."""
    d = x.shape[1]
    df = x.df.select(_ROW, _FEAT).cache()
    try:
        # init: sample n_clusters rows (seeded, like check_random_state)
        n = x.shape[0]
        rng = np.random.RandomState(random_state)
        idx = sorted(rng.choice(n, n_clusters, replace=False).tolist())
        init_rows = df.where(F.col(_ROW).isin([int(i) for i in idx])).collect()
        centers = np.array(
            [r[_FEAT] for r in sorted(init_rows, key=lambda r: r[_ROW])]
        )

        n_iter = 0
        for it in range(max_iter):
            n_iter = it + 1
            assigned = assign_to_centers(df, _FEAT, centers.tolist())
            sums = [
                F.sum(F.element_at(F.col(_FEAT), j + 1)).alias(f"s{j}")
                for j in range(d)
            ]
            stats = (
                assigned.groupBy("cluster")
                .agg(F.count(F.lit(1)).alias("cnt"), *sums)
                .collect()
            )
            new_centers = centers.copy()
            for r in stats:
                c = r["cluster"]
                new_centers[c] = [r[f"s{j}"] / r["cnt"] for j in range(d)]
            shift = float(np.sum((new_centers - centers) ** 2))
            centers = new_centers
            if shift < tol * tol:
                break
        return centers, n_iter
    finally:
        df.unpersist()


class KMeans:
    """sklearn-style facade over MLlib KMeans (reference
    cluster/kmeans/base.py:23-199). ``init='random'`` matches the
    reference default."""

    def __init__(
        self,
        n_clusters: int = 8,
        init: str = "random",
        max_iter: int = 10,
        tol: float = 1e-4,
        random_state: int = 0,
    ):
        self.n_clusters = n_clusters
        self.init = init
        self.max_iter = max_iter
        self.tol = tol
        self.random_state = random_state
        self.centers: np.ndarray | None = None
        self._model = None

    def fit(self, x: DsArray) -> "KMeans":
        from pyspark.ml.clustering import KMeans as MLKMeans
        from pyspark.ml.functions import array_to_vector

        df = x.df.select(
            _ROW, array_to_vector(F.col(_FEAT)).alias("_v")
        )
        km = MLKMeans(
            k=self.n_clusters,
            initMode="random" if self.init == "random" else "k-means||",
            maxIter=self.max_iter,
            tol=self.tol,
            seed=self.random_state,
            featuresCol="_v",
            predictionCol="cluster",
        )
        self._model = km.fit(df)
        self.centers = np.array(
            [np.asarray(c) for c in self._model.clusterCenters()]
        )
        return self

    def predict(self, x: DsArray) -> DsArray:
        """Assignment via broadcast-literal centers (no MLlib model
        needed at inference — works after load_model too)."""
        assigned = assign_to_centers(x.df, _FEAT, self.centers.tolist())
        df = assigned.select(
            _ROW, F.array(F.col("cluster").cast("double")).alias(_FEAT)
        )
        return DsArray(df, (x.shape[0], 1))

    def fit_predict(self, x: DsArray) -> DsArray:
        return self.fit(x).predict(x)
