"""Gaussian mixture clustering.

Reference: ``dislib/cluster/gm/base.py:168-939`` — EM with
distributed E-step (per-block log-responsibilities) and M-step
(weighted moments tree-reduced), covariance types full/tied/diag/
spherical, Cholesky precisions, lower-bound convergence.

Spark-first: the ``full`` covariance path is MLlib
``GaussianMixture`` (the same EM with aggregateByKey partials). The
tied/diag/spherical variants MLlib lacks are a custom EM whose E-step
is a JVM/numpy-vectorized ``mapInPandas`` and whose M-step partials
are ONE groupBy-free global aggregation per iteration (Arrow-batched
moment sums) — mirroring the reference's partial/tree-reduce
(``gm/base.py:698-727``) with Spark's partial aggregation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW
from dislib_spark.utils.base import prediction_to_dsarray, to_ml_df


class GaussianMixture:
    """sklearn-style facade (reference cluster/gm/base.py:23-225)."""

    def __init__(
        self,
        n_components: int = 1,
        covariance_type: str = "full",
        tol: float = 1e-3,
        reg_covar: float = 1e-6,
        max_iter: int = 100,
        init_params: str = "kmeans",
        random_state: int = 0,
        backend: str = "native",
    ):
        if covariance_type not in ("full", "tied", "diag", "spherical"):
            raise ValueError(f"bad covariance_type {covariance_type}")
        if init_params not in ("kmeans", "random"):
            raise ValueError(f"bad init_params {init_params}")
        if backend not in ("native", "mllib"):
            raise ValueError(f"bad backend {backend}")
        self.n_components = n_components
        self.covariance_type = covariance_type
        self.tol = tol
        self.reg_covar = reg_covar
        self.max_iter = max_iter
        self.init_params = init_params
        self.random_state = random_state
        self.backend = backend
        self.weights_: np.ndarray | None = None
        self.means_: np.ndarray | None = None
        self.covariances_ = None
        self._ml_model = None

    # -- fit ----------------------------------------------------------
    def fit(self, x: DsArray) -> "GaussianMixture":
        """Default 'native' backend: the Arrow EM for ALL covariance
        types with reference-faithful kmeans init (gm/base.py:44);
        'mllib' delegates full-covariance to MLlib GaussianMixture
        (random init only — MLlib exposes no initial model)."""
        if self.backend == "mllib":
            if self.covariance_type != "full":
                raise ValueError("mllib backend supports covariance_type='full' only")
            return self._fit_mllib(x)
        return self._fit_custom(x)

    def _fit_mllib(self, x: DsArray) -> "GaussianMixture":
        from pyspark.ml.clustering import GaussianMixture as MLGMM

        df = to_ml_df(x)
        gm = MLGMM(
            k=self.n_components,
            tol=self.tol,
            maxIter=self.max_iter,
            seed=self.random_state,
            featuresCol="_v",
            predictionCol="prediction",
        )
        self._ml_model = gm.fit(df)
        self.weights_ = np.array(self._ml_model.weights)
        gaussians = self._ml_model.gaussiansDF.collect()
        self.means_ = np.array([np.asarray(g["mean"]) for g in gaussians])
        self.covariances_ = np.array(
            [np.asarray(g["cov"].toArray()) for g in gaussians]
        )
        return self

    def _fit_custom(self, x: DsArray) -> "GaussianMixture":
        """EM for tied/diag/spherical: driver holds the (small)
        parameters; each iteration = one Arrow-batched pass computing
        per-component moment partials (resp sums, weighted feature
        sums, weighted square sums) merged by Spark's partial agg —
        the reference's _partial/_reduce_estimate_parameters
        (gm/base.py:698-727) as a single distributed aggregation."""
        import pandas as pd

        n, d = x.shape
        k = self.n_components
        rng = np.random.RandomState(self.random_state)

        if self.init_params == "kmeans":
            # reference default init_params='kmeans' (gm/base.py:44):
            # a KMeans pass gives sharp initial responsibilities —
            # essential for tied covariance, where a diffuse start
            # inflates the shared scatter and EM can't recover.
            # k-means|| seeding avoids Lloyd's bad local optima.
            from dislib_spark.cluster.kmeans import KMeans

            km = KMeans(
                n_clusters=k,
                init="k-means||",
                max_iter=10,
                random_state=self.random_state,
            ).fit(x)
            means = km.centers
        else:
            # random: seeded sample rows
            idx = sorted(rng.choice(n, k, replace=False).tolist())
            rows = x.df.where(
                F.col(_ROW).isin([int(i) for i in idx])
            ).collect()
            means = np.array(
                [r[_FEAT] for r in sorted(rows, key=lambda r: r[_ROW])]
            )
        weights = np.full(k, 1.0 / k)
        cov = self._init_cov(d, k)

        df = x.df.select(_FEAT).cache()
        try:
            prev_lb = -np.inf
            for _ in range(self.max_iter):
                stats = self._em_pass(df, weights, means, cov)
                nk = stats["nk"] + 10 * np.finfo(float).eps
                weights = nk / n
                means = stats["mean_sum"] / nk[:, None]
                cov = self._m_step_cov(stats, nk, means, d)
                lb = stats["log_prob_sum"] / n
                if abs(lb - prev_lb) < self.tol:
                    break
                prev_lb = lb
            self.weights_, self.means_, self.covariances_ = weights, means, cov
            return self
        finally:
            df.unpersist()

    def _init_cov(self, d: int, k: int):
        if self.covariance_type == "full":
            return np.tile(np.eye(d), (k, 1, 1))
        if self.covariance_type == "tied":
            return np.eye(d)
        if self.covariance_type == "diag":
            return np.ones((k, d))
        return np.ones(k)  # spherical

    def _log_resp(self, xb: np.ndarray, weights, means, cov):
        """Vectorized log responsibilities for one Arrow batch."""
        k, d = means.shape
        if self.covariance_type == "full":
            maha = np.empty((len(xb), k))
            log_det = np.empty(k)
            for c in range(k):
                reg = cov[c] + self.reg_covar * np.eye(d)
                prec = np.linalg.inv(reg)
                _, log_det[c] = np.linalg.slogdet(reg)
                diff = xb - means[c]
                maha[:, c] = np.einsum("ni,ij,nj->n", diff, prec, diff)
        elif self.covariance_type == "tied":
            reg = cov + self.reg_covar * np.eye(d)
            prec = np.linalg.inv(reg)
            _, logdet = np.linalg.slogdet(reg)
            diff = xb[:, None, :] - means[None, :, :]  # (n,k,d)
            maha = np.einsum("nkd,de,nke->nk", diff, prec, diff)
            log_det = np.full(k, logdet)
        elif self.covariance_type == "diag":
            var = cov + self.reg_covar
            diff = xb[:, None, :] - means[None, :, :]
            maha = np.sum(diff * diff / var[None, :, :], axis=2)
            log_det = np.sum(np.log(var), axis=1)
        else:  # spherical
            var = cov + self.reg_covar
            diff = xb[:, None, :] - means[None, :, :]
            maha = np.sum(diff * diff, axis=2) / var[None, :]
            log_det = d * np.log(var)
        log_prob = -0.5 * (d * np.log(2 * np.pi) + log_det[None, :] + maha)
        weighted = log_prob + np.log(weights)[None, :]
        norm = np.logaddexp.reduce(weighted, axis=1)
        return weighted - norm[:, None], norm

    def _em_pass(self, df, weights, means, cov) -> dict:
        """One E+partial-M pass: mapInPandas emits per-batch moment
        partials PACKED INTO ONE ARRAY (a k·(2d+2)-wide schema
        triggers quadratic codegen in the merge agg — same lesson as
        PCA); element-wise merge via posexplode + idx-grouped sum."""
        import pandas as pd

        k, d = means.shape
        w_b, m_b, c_b = weights.copy(), means.copy(), cov.copy()
        log_resp_fn = self._log_resp

        tied = self.covariance_type == "tied"
        full = self.covariance_type == "full"

        def emit(batches):
            for pdf in batches:
                xb = np.array(pdf[_FEAT].tolist(), dtype=np.float64)
                if len(xb) == 0:
                    continue
                log_r, norm = log_resp_fn(xb, w_b, m_b, c_b)
                r = np.exp(log_r)  # (n,k)
                parts = [
                    [norm.sum()],
                    r.sum(axis=0),  # nk (k,)
                    (r.T @ xb).ravel(),  # mean_sum (k·d,)
                    (r.T @ (xb * xb)).ravel(),  # sq_sum (k·d,)
                ]
                if tied:
                    # global second-moment matrix: tied covariance
                    # needs the off-diagonals (Σ_n x xᵀ — the resp
                    # weights sum to 1 per row, so they drop out)
                    parts.append((xb.T @ xb)[np.triu_indices(d)])
                if full:
                    # per-component weighted scatter Σ_n r_nk x xᵀ
                    iu = np.triu_indices(d)
                    m2 = np.einsum("nk,ni,nj->kij", r, xb, xb)
                    parts.append(m2[:, iu[0], iu[1]].ravel())
                vec = np.concatenate(parts)
                yield pd.DataFrame({"partial": [vec.tolist()]})

        partials = df.mapInPandas(emit, "partial array<double>")
        summed = (
            partials.select(F.posexplode("partial").alias("idx", "v"))
            .groupBy("idx")
            .agg(F.sum("v").alias("s"))
            .collect()
        )
        n_triu = d * (d + 1) // 2
        extra = n_triu if tied else (k * n_triu if full else 0)
        vec = np.zeros(1 + k + 2 * k * d + extra)
        for r in summed:
            vec[r["idx"]] = r["s"]
        out = {
            "log_prob_sum": vec[0],
            "nk": vec[1 : 1 + k],
            "mean_sum": vec[1 + k : 1 + k + k * d].reshape(k, d),
            "sq_sum": vec[1 + k + k * d : 1 + k + 2 * k * d].reshape(k, d),
        }
        tail = vec[1 + k + 2 * k * d :]
        iu = np.triu_indices(d)
        if tied:
            xx = np.zeros((d, d))
            xx[iu] = tail
            xx.T[iu] = tail
            out["xx_sum"] = xx
        if full:
            m2 = np.zeros((k, d, d))
            flat = tail.reshape(k, n_triu)
            for c in range(k):
                m2[c][iu] = flat[c]
                m2[c].T[iu] = flat[c]
            out["m2"] = m2
        return out

    def _m_step_cov(self, stats, nk, means, d):
        """Covariance update per type (reference gm/base.py:738-886:
        _update_covariance_{full,tied,diag,spherical})."""
        sq_sum, mean_sum = stats["sq_sum"], stats["mean_sum"]
        if self.covariance_type == "full":
            # C_k = M2_k/n_k − μ_k μ_kᵀ
            return (
                stats["m2"] / nk[:, None, None]
                - np.einsum("ki,kj->kij", means, means)
            )
        if self.covariance_type == "tied":
            # exact tied: (Σ x xᵀ − Σ_k nk μk μkᵀ) / n  (the d(d+1)/2
            # scatter partials ride the same packed array)
            scatter = stats["xx_sum"] - np.einsum("k,ki,kj->ij", nk, means, means)
            return scatter / nk.sum()
        # E[x²] - 2μE[x] + μ² per component/feature
        ex2 = sq_sum / nk[:, None]
        var = ex2 - 2 * means * (mean_sum / nk[:, None]) + means**2
        var = np.maximum(var, 0.0) + self.reg_covar
        if self.covariance_type == "diag":
            return var
        return var.mean(axis=1)  # spherical

    # -- inference ----------------------------------------------------
    def predict(self, x: DsArray) -> DsArray:
        if self._ml_model is not None:
            df = to_ml_df(x)
            pred = self._ml_model.transform(df).select(_ROW, "prediction")
            return prediction_to_dsarray(pred, x.shape[0])

        import pandas as pd

        w_b, m_b, c_b = self.weights_, self.means_, self.covariances_
        log_resp_fn = self._log_resp

        def assign(batches):
            for pdf in batches:
                xb = np.array(pdf[_FEAT].tolist(), dtype=np.float64)
                if len(xb) == 0:
                    continue
                log_r, _ = log_resp_fn(xb, w_b, m_b, c_b)
                yield pd.DataFrame(
                    {_ROW: pdf[_ROW], "prediction": log_r.argmax(axis=1)}
                )

        # NO fan_out here (A/B-measured in bench position, r10): the
        # vectorized E-step is ~0.1 s of numpy per million rows, so on
        # an under-split local input the 32-way repartition only buys
        # 32 COLD python-worker startups (~0.6-2 s in-context) for
        # compute that one warm worker finishes faster. At real scale
        # the scan is already split, so the repartition would be a
        # no-op there — it only ever fires where it hurts.
        pred = x.df.mapInPandas(assign, f"{_ROW} long, prediction int")
        return prediction_to_dsarray(pred, x.shape[0])

    def fit_predict(self, x: DsArray) -> DsArray:
        return self.fit(x).predict(x)
