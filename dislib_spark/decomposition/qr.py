"""QR / TSQR decomposition surface.

Reference: ``dislib/decomposition/qr/base.py:16-102`` (modes full /
economic / r over square block grids) and
``dislib/decomposition/tsqr/base.py:11-740`` (tall-skinny QR with
complete/reduced/inverse modes, power-of-2 tree).

Spark-first: economic/r modes ride the communication-avoiding TSQR in
``dislib_spark.array.linalg.qr_economic`` (RowMatrix.tallSkinnyQR —
the same R-merge tree the reference builds by hand, minus the
power-of-2 block constraint, which was an artifact of its block
geometry). Full/complete modes ride
``dislib_spark.array.linalg.qr_full`` — one-level TSQR with
null-space completion (two ``applyInPandas`` passes; only the K×d
stacked leaf R's touch the driver). The n×n Q output is inherently
O(n²) — same as the reference's full modes — so use it for moderate
n, or pass ``indexes`` to materialize only the selected Q columns
(O(n·|indexes|), the at-scale path).
"""

from __future__ import annotations

import numpy as np

from dislib_spark.array.core import DsArray
from dislib_spark.array.linalg import qr_economic, qr_full, svd


def qr(a: DsArray, mode: str = "economic"):
    """reference decomposition/qr/base.py:16-102.

    mode='economic' → (Q (n×d) DsArray, R (d×d) ndarray)
    mode='r'        → R only
    mode='full'     → (Q (n×n) DsArray, R (n×d) ndarray), QᵀQ=I,
                      triu(R)=R, Q·R=A (reference tests/test_qr.py)
    """
    if mode == "economic":
        return qr_economic(a)
    if mode == "r":
        _, r = qr_economic(a)
        return r
    if mode == "full":
        return qr_full(a)
    raise ValueError(f"unknown mode {mode}")


def tsqr(a: DsArray, mode: str = "reduced", indexes=None):
    """reference decomposition/tsqr/base.py:11-740.

    reduced → (Q (n×d), R (d×d)); r_reduced → R only;
    reduced_inverse → same (Q, R) contract as reduced.

    complete → (Q (n×n), R (n×d)) via ``linalg.qr_full``;
    r_complete → the n×d R only; complete_inverse → same (Q, R)
    contract as complete. BOTH "_inverse" variants return plain
    (Q, R): in the reference they differ only in HOW Q is accumulated
    — backward, "from end to beginning" (tsqr/base.py:21-23) — not in
    what is returned; its tests (tests/test_tsqr.py:204-243) assert
    triu(R) and Q·R = A on the reduced_inverse output, NOT an
    inverted R. Unlike the reference, no power-of-2 block-count
    restriction (an artifact of its block geometry — ValueError
    tsqr/base.py:287-289).

    ``indexes`` selects columns of Q (reference ``indexes=`` — its
    _construct_identity right-multiplies Q by identity columns):
    supported for every Q-returning mode; with the complete modes it
    avoids the n² materialization entirely.
    """
    if mode == "reduced":
        q, r = qr_economic(a)
        return (_q_columns(q, indexes), r) if indexes else (q, r)
    if mode == "r_reduced":
        _, r = qr_economic(a)
        return r
    if mode == "reduced_inverse":
        q, r = qr_economic(a)
        return (_q_columns(q, indexes), r) if indexes else (q, r)
    if mode in ("complete", "complete_inverse"):
        return qr_full(a, indexes=indexes)
    if mode == "r_complete":
        _, r = qr_full(a, indexes=[])
        return r
    raise ValueError(f"unknown mode {mode}")


def _q_columns(q: DsArray, indexes) -> DsArray:
    """Column-select a DsArray (reference indexes= semantics)."""
    from pyspark.sql import functions as F

    from dislib_spark.array.core import _FEAT, _ROW

    cols = F.array(
        *[F.element_at(F.col(_FEAT), int(i) + 1) for i in indexes]
    )
    return DsArray(
        q.df.select(_ROW, cols.alias(_FEAT)), (q.shape[0], len(indexes))
    )


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
