"""Generic consensus ADMM.

Reference: ``dislib/optimization/admm/base.py:28-230`` — per-partition
x-update (cvxpy prox), driver z-update (soft threshold), u-update;
convergence on primal/dual residuals.

Spark-first: the x-update is an ``applyInPandas`` over partitions
with a USER-SUPPLIED numpy prox function (no cvxpy-on-executors);
z/u updates are driver-side closed form on the k×d consensus
variables. One Arrow round-trip per iteration.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


def soft_threshold(v: np.ndarray, k: float) -> np.ndarray:
    """reference admm/base.py z-update kernel."""
    return np.sign(v) * np.maximum(np.abs(v) - k, 0.0)


class ADMM:
    """Consensus ADMM with pluggable per-partition prox.

    ``x_update(A, b, z, u, rho) -> x`` solves the local subproblem on
    one partition's data (numpy in, numpy out).
    ``z_update(x_mean, u_mean, rho) -> z`` is the global consensus
    step (default: lasso soft-threshold, reference
    optimization/admm/base.py:150-230).
    """

    def __init__(
        self,
        x_update: Callable,
        z_update: Callable | None = None,
        rho: float = 1.0,
        max_iter: int = 100,
        atol: float = 1e-4,
        rtol: float = 1e-2,
        lmbd: float = 1e-3,
        n_partitions: int = 8,
    ):
        self.x_update = x_update
        self.z_update = z_update or (
            lambda xm, um, rho: soft_threshold(xm + um, lmbd / (rho * 1.0))
        )
        self.rho = rho
        self.max_iter = max_iter
        self.atol = atol
        self.rtol = rtol
        self.n_partitions = n_partitions
        self.z_: np.ndarray | None = None
        self.n_iter_: int = 0

    def fit(self, x: DsArray, y: DsArray) -> "ADMM":
        import pandas as pd

        d = x.shape[1]
        k = self.n_partitions
        rho = self.rho
        x_update = self.x_update

        paired = (
            x.df.join(
                y.df.select(
                    _ROW, F.element_at(F.col(_FEAT), 1).alias("_y")
                ),
                _ROW,
            )
            .withColumn("part", F.pmod(F.col(_ROW), F.lit(k)).cast("int"))
            .cache()
        )
        try:
            z = np.zeros(d)
            u = np.zeros((k, d))
            xs = np.zeros((k, d))
            for it in range(self.max_iter):
                self.n_iter_ = it + 1
                z_b, u_b = z.copy(), u.copy()

                def solve(pdf: pd.DataFrame) -> pd.DataFrame:
                    pid = int(pdf["part"].iloc[0])
                    A = np.array(pdf[_FEAT].tolist(), dtype=np.float64)
                    b = pdf["_y"].to_numpy(dtype=np.float64)
                    xi = x_update(A, b, z_b, u_b[pid], rho)
                    out = {"part": [pid]}
                    for j in range(d):
                        out[f"x{j}"] = [float(xi[j])]
                    return pd.DataFrame(out)

                schema = "part int, " + ", ".join(
                    f"x{j} double" for j in range(d)
                )
                rows = (
                    paired.groupBy("part").applyInPandas(solve, schema).collect()
                )
                for r in rows:
                    xs[r["part"]] = [r[f"x{j}"] for j in range(d)]

                x_mean = xs.mean(axis=0)
                u_mean = u.mean(axis=0)
                z_old = z
                z = self.z_update(x_mean, u_mean, rho)
                u = u + xs - z[None, :]

                r_norm = float(np.linalg.norm(xs - z[None, :]))
                s_norm = float(np.linalg.norm(-rho * (z - z_old)))
                eps_pri = np.sqrt(k * d) * self.atol + self.rtol * max(
                    float(np.linalg.norm(xs)), float(np.linalg.norm(z)) * np.sqrt(k)
                )
                eps_dual = np.sqrt(k * d) * self.atol + self.rtol * float(
                    np.linalg.norm(rho * u)
                )
                if r_norm < eps_pri and s_norm < eps_dual:
                    break
            self.z_ = z
            return self
        finally:
            paired.unpersist()
