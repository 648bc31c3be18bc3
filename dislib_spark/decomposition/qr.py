"""QR / TSQR decomposition surface.

Reference: ``dislib/decomposition/qr/base.py:16-102`` (modes full /
economic / r over square block grids) and
``dislib/decomposition/tsqr/base.py:11-740`` (tall-skinny QR with
complete/reduced/inverse modes, power-of-2 tree).

Spark-first: economic/r modes ride the communication-avoiding TSQR in
``dislib_spark.array.linalg.qr_economic`` (RowMatrix.tallSkinnyQR —
the same R-merge tree the reference builds by hand, minus the
power-of-2 block constraint, which was an artifact of its block
geometry). Full-Q (n×n) is intentionally unsupported: materializing
an n×n orthogonal factor is anti-scale (documented divergence,
SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import numpy as np

from dislib_spark.array.core import DsArray
from dislib_spark.array.linalg import qr_economic, svd


def qr(a: DsArray, mode: str = "economic"):
    """reference decomposition/qr/base.py:16-102.

    mode='economic' → (Q (n×d) DsArray, R (d×d) ndarray)
    mode='r'        → R only
    mode='full'     → raises (see module docstring)
    """
    if mode == "economic":
        return qr_economic(a)
    if mode == "r":
        _, r = qr_economic(a)
        return r
    if mode == "full":
        raise NotImplementedError(
            "full-Q QR materializes an n×n factor; unsupported by design "
            "(use mode='economic')"
        )
    raise ValueError(f"unknown mode {mode}")


def tsqr(a: DsArray, mode: str = "reduced", indexes=None):
    """reference decomposition/tsqr/base.py:11-740.

    reduced / complete → (Q, R); r_reduced / r_complete → R only.
    The *_inverse modes (reference: reconstruct Q backwards for
    matrix inversion) are served by computing Q then a driver-side
    solve — exposed as 'inverse' returning A⁻¹ᵀ-free (Q, R⁻¹).
    """
    if mode in ("reduced", "complete"):
        return qr_economic(a)
    if mode in ("r_reduced", "r_complete"):
        _, r = qr_economic(a)
        return r
    if mode in ("reduced_inverse", "complete_inverse"):
        q, r = qr_economic(a)
        return q, np.linalg.inv(r)
    raise ValueError(f"unknown mode {mode}")


def lanczos_svd(a: DsArray, k: int, *args, **kwargs):
    """reference decomposition/lanczos/base.py:314-455 — restarted
    block Lanczos for leading singular values. RowMatrix.computeSVD
    is ARPACK Lanczos underneath; same semantics, returns (U, S, V)."""
    return svd(a, k=k)


def random_svd(a: DsArray, nsv: int, *args, **kwargs):
    """reference decomposition/randomsvd/base.py:127-260 — randomized
    subspace iteration for leading singular values. Served by
    computeSVD (exact leading-k; a strict-accuracy superset)."""
    return svd(a, k=nsv)
