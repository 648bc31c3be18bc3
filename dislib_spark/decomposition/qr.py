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

    reduced → (Q (n×d), R (d×d)); r_reduced → R only;
    reduced_inverse → (Q, R⁻¹) (the reference's backward-Q
    reconstruction for matrix inversion, served by a driver-side
    solve on the small R).

    complete / r_complete / complete_inverse raise: the reference's
    complete mode materializes an n×n orthogonal Q
    (tests/test_tsqr.py asserts those shapes) — anti-scale by
    design here, and silently returning the economic (n×d) shape
    would corrupt a caller's downstream math. Same policy as
    ``qr(mode='full')``.
    """
    if mode == "reduced":
        return qr_economic(a)
    if mode == "r_reduced":
        _, r = qr_economic(a)
        return r
    if mode == "reduced_inverse":
        q, r = qr_economic(a)
        return q, np.linalg.inv(r)
    if mode in ("complete", "r_complete", "complete_inverse"):
        raise NotImplementedError(
            f"tsqr mode={mode!r} materializes an n×n orthogonal factor "
            "(reference tsqr/base.py complete modes); unsupported by "
            "design at scale — use mode='reduced' (economic shapes)"
        )
    raise ValueError(f"unknown mode {mode}")


def lanczos_svd(a: DsArray, k: int, *args, **kwargs):
    """reference decomposition/lanczos/base.py:314-455 — restarted
    block Lanczos for leading singular values. RowMatrix.computeSVD
    is ARPACK Lanczos underneath; same semantics, returns (U, S, V).

    Extra tolerance/iteration arguments are accepted for reference
    API parity but IGNORED — computeSVD converges to machine
    precision on the leading k values (a strict-accuracy superset)."""
    return svd(a, k=k)


def random_svd(a: DsArray, nsv: int, *args, **kwargs):
    """reference decomposition/randomsvd/base.py:127-260 — randomized
    subspace iteration for leading singular values. Served by
    computeSVD (exact leading-k; a strict-accuracy superset).

    Extra tolerance/iteration arguments are accepted for reference
    API parity but IGNORED (see lanczos_svd)."""
    return svd(a, k=nsv)
