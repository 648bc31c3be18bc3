"""Principal component analysis.

Reference: ``dislib/decomposition/pca/base.py:72-372`` — center, then
either (eig) distributed scatter-matrix partials tree-reduced + local
``eigh``, or (svd) block-Jacobi SVD.

Spark-first: the scatter matrix X'X is ONE distributed aggregation
(d(d+1)/2 sum expressions, map-side partials — the reference's
arity-tree in Catalyst's partial/final agg), then a driver-side
``numpy.linalg.eigh`` on the d×d matrix. This is exactly MLlib's
RowMatrix.computeCovariance strategy without the RDD detour; valid
while d ≲ 2000 (beyond that, switch to computeSVD's ARPACK path via
``dislib_spark.array.linalg.svd``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


class PCA:
    """sklearn-style facade (reference decomposition/pca/base.py)."""

    def __init__(self, n_components: int | None = None, method: str = "eig"):
        if method not in ("eig", "svd"):
            raise ValueError("method must be 'eig' or 'svd'")
        self.n_components = n_components
        self.method = method
        self.mean_: np.ndarray | None = None
        self.components_: np.ndarray | None = None
        self.explained_variance_: np.ndarray | None = None

    def fit(self, x: DsArray) -> "PCA":
        n, d = x.shape
        k = self.n_components or d
        e = [F.element_at(F.col(_FEAT), j + 1) for j in range(d)]

        # one pass: means + upper-triangle second moments
        exprs = [F.avg(e[j]).alias(f"m{j}") for j in range(d)]
        for i in range(d):
            for j in range(i, d):
                exprs.append(F.sum(e[i] * e[j]).alias(f"s{i}_{j}"))
        row = x.df.agg(*exprs).collect()[0]

        mean = np.array([row[f"m{j}"] for j in range(d)])
        s = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                s[i, j] = s[j, i] = row[f"s{i}_{j}"]
        # covariance (ddof=0) from raw moments: E[xx']-μμ'
        cov = s / n - np.outer(mean, mean)

        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1]
        w, v = w[order], v[:, order]
        # sign convention: largest-|.| element of each component > 0
        for c in range(v.shape[1]):
            if v[np.argmax(np.abs(v[:, c])), c] < 0:
                v[:, c] = -v[:, c]
        self.mean_ = mean
        self.components_ = v[:, :k].T
        self.explained_variance_ = w[:k]
        return self

    def transform(self, x: DsArray) -> DsArray:
        """Project onto components: (x-μ) Vᵀ as a narrow JVM map
        (components broadcast as literals)."""
        comps = self.components_
        mu = self.mean_
        k, d = comps.shape
        cols = []
        for c in range(k):
            expr = None
            for j in range(d):
                term = (
                    F.element_at(F.col(_FEAT), j + 1) - F.lit(float(mu[j]))
                ) * F.lit(float(comps[c, j]))
                expr = term if expr is None else expr + term
            cols.append(expr)
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, (x.shape[0], k))

    def fit_transform(self, x: DsArray) -> DsArray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x: DsArray) -> DsArray:
        comps = self.components_
        mu = self.mean_
        k, d = comps.shape
        cols = []
        for j in range(d):
            expr = F.lit(float(mu[j]))
            for c in range(k):
                expr = expr + F.element_at(F.col(_FEAT), c + 1) * F.lit(
                    float(comps[c, j])
                )
            cols.append(expr)
        df = x.df.select(_ROW, F.array(*cols).alias(_FEAT))
        return DsArray(df, (x.shape[0], d))
