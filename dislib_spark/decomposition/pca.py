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

        # one Arrow-batched pass: per-batch (count, Σx, X'X) partials,
        # summed by Spark. d² agg EXPRESSIONS would be quadratic
        # codegen (measured 28 s at d=64); a numpy GEMM per batch is
        # the reference's _partial_scatter (pca/base.py:316-372) with
        # Arrow instead of COMPSs tasks.
        import pandas as pd

        n_triu = d * (d + 1) // 2

        def partials(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(pdf[_FEAT].tolist(), dtype=np.float64)
                vec = np.concatenate(
                    [[float(len(X))], X.sum(axis=0), (X.T @ X)[np.triu_indices(d)]]
                )
                yield pd.DataFrame({"partial": [vec.tolist()]})

        # partials packed into ONE array column (a 1+d+d(d+1)/2-wide
        # schema triggers quadratic codegen in the final agg —
        # measured 17 s at d=64); element-wise merge via posexplode +
        # idx-grouped sum (tiny shuffle: one array per batch).
        pdf = x.df.select(_FEAT).mapInPandas(partials, "partial array<double>")
        summed = (
            pdf.select(F.posexplode("partial").alias("idx", "v"))
            .groupBy("idx")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        vec = np.zeros(1 + d + n_triu)
        for r in summed:
            vec[r["idx"]] = r["s"]

        cnt = vec[0]
        mean = vec[1 : 1 + d] / cnt
        s = np.zeros((d, d))
        iu = np.triu_indices(d)
        s[iu] = vec[1 + d :]
        s.T[iu] = vec[1 + d :]
        # covariance (ddof=0) from raw moments: E[xx']-μμ'
        cov = s / cnt - np.outer(mean, mean)

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
        """Project onto components: (x-μ) Vᵀ as a narrow JVM map —
        components as an array-of-arrays literal + one dot product
        per component (HOF form; k·d expanded expression chains are
        quadratic codegen)."""
        from dislib_spark.array.linalg import _matmul_local

        centered = DsArray(
            x.df.select(
                _ROW,
                F.zip_with(
                    F.col(_FEAT),
                    F.array(*[F.lit(float(m)) for m in self.mean_]),
                    lambda v, m: v - m,
                ).alias(_FEAT),
            ),
            x.shape,
        )
        return _matmul_local(centered, self.components_.T)

    def fit_transform(self, x: DsArray) -> DsArray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x: DsArray) -> DsArray:
        from dislib_spark.array.linalg import _matmul_local

        back = _matmul_local(x, self.components_)
        df = back.df.select(
            _ROW,
            F.zip_with(
                F.col(_FEAT),
                F.array(*[F.lit(float(m)) for m in self.mean_]),
                lambda v, m: v + m,
            ).alias(_FEAT),
        )
        return DsArray(df, (x.shape[0], self.components_.shape[1]))
