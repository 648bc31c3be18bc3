"""Minimal C-SVM dual solver (simplified Platt SMO).

Standalone numpy replacement for the sklearn ``SVC`` the reference
trains per cascade node (``classification/csvm/base.py:574-595``):
this container has no scikit-learn, and cascade leaves are small
(thousands of rows), where SMO is perfectly adequate. Implements the
sklearn subset CascadeSVM needs: binary fit / decision_function /
predict / support_.

Algorithm: Platt's SMO with the simplified pair-selection of the
Stanford CS229 handout (public domain formulation): outer loop over
KKT violators, random second index, analytic pair update with box
clipping, bias from the averaged KKT-satisfying constraint.
"""

from __future__ import annotations

import numpy as np


def _kernel(X1: np.ndarray, X2: np.ndarray, kind: str, gamma: float) -> np.ndarray:
    if kind == "linear":
        return X1 @ X2.T
    if kind == "rbf":
        d2 = (
            (X1 * X1).sum(1)[:, None]
            + (X2 * X2).sum(1)[None, :]
            - 2.0 * (X1 @ X2.T)
        )
        return np.exp(-gamma * np.maximum(d2, 0.0))
    raise ValueError(f"unknown kernel {kind}")


class SimpleSVC:
    """Binary C-SVM. Labels may be any two values; stored classes_
    sorted ascending, decision > 0 → classes_[1]."""

    def __init__(
        self,
        kernel: str = "rbf",
        C: float = 1.0,
        gamma: str | float = "auto",
        tol: float = 1e-3,
        max_passes: int = 5,
        max_iter: int = 2000,
        random_state: int = 0,
    ):
        self.kernel = kernel
        self.C = C
        self.gamma = gamma
        self.tol = tol
        self.max_passes = max_passes
        self.max_iter = max_iter
        self.random_state = random_state

    def _gamma_value(self, X: np.ndarray) -> float:
        if self.gamma == "auto":
            return 1.0 / X.shape[1]
        if self.gamma == "scale":
            v = X.var()
            return 1.0 / (X.shape[1] * v) if v > 0 else 1.0
        return float(self.gamma)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "SimpleSVC":
        X = np.asarray(X, dtype=np.float64)
        self.classes_ = np.unique(y)
        if len(self.classes_) != 2:
            raise ValueError("SimpleSVC is binary")
        yy = np.where(y == self.classes_[1], 1.0, -1.0)
        n = len(X)
        g = self._gamma_value(X)
        K = _kernel(X, X, self.kernel, g)
        alpha = np.zeros(n)
        b = 0.0
        rng = np.random.RandomState(self.random_state)
        passes, it = 0, 0
        while passes < self.max_passes and it < self.max_iter:
            it += 1
            changed = 0
            for i in range(n):
                Ei = float(K[i] @ (alpha * yy) + b - yy[i])
                if (yy[i] * Ei < -self.tol and alpha[i] < self.C) or (
                    yy[i] * Ei > self.tol and alpha[i] > 0
                ):
                    j = rng.randint(n - 1)
                    if j >= i:
                        j += 1
                    Ej = float(K[j] @ (alpha * yy) + b - yy[j])
                    ai_old, aj_old = alpha[i], alpha[j]
                    if yy[i] != yy[j]:
                        L = max(0.0, aj_old - ai_old)
                        H = min(self.C, self.C + aj_old - ai_old)
                    else:
                        L = max(0.0, ai_old + aj_old - self.C)
                        H = min(self.C, ai_old + aj_old)
                    if L >= H:
                        continue
                    eta = 2.0 * K[i, j] - K[i, i] - K[j, j]
                    if eta >= 0:
                        continue
                    aj = aj_old - yy[j] * (Ei - Ej) / eta
                    aj = min(max(aj, L), H)
                    if abs(aj - aj_old) < 1e-7:
                        continue
                    ai = ai_old + yy[i] * yy[j] * (aj_old - aj)
                    alpha[i], alpha[j] = ai, aj
                    b1 = (
                        b - Ei
                        - yy[i] * (ai - ai_old) * K[i, i]
                        - yy[j] * (aj - aj_old) * K[i, j]
                    )
                    b2 = (
                        b - Ej
                        - yy[i] * (ai - ai_old) * K[i, j]
                        - yy[j] * (aj - aj_old) * K[j, j]
                    )
                    if 0 < ai < self.C:
                        b = b1
                    elif 0 < aj < self.C:
                        b = b2
                    else:
                        b = (b1 + b2) / 2.0
                    changed += 1
            passes = passes + 1 if changed == 0 else 0

        sv = alpha > 1e-8
        self.support_ = np.nonzero(sv)[0]
        self._sv_x = X[sv]
        self._sv_ay = (alpha * yy)[sv]
        self._b = b
        self._gamma_val = g
        # dual objective (for the reference's Lagrangian convergence
        # check, csvm/base.py:283-329)
        self.dual_objective_ = float(
            alpha.sum() - 0.5 * (alpha * yy) @ K @ (alpha * yy)
        )
        return self

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        K = _kernel(np.asarray(X, dtype=np.float64), self._sv_x, self.kernel, self._gamma_val)
        return K @ self._sv_ay + self._b

    def predict(self, X: np.ndarray) -> np.ndarray:
        d = self.decision_function(X)
        return np.where(d > 0, self.classes_[1], self.classes_[0])
