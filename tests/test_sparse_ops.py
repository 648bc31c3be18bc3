"""SparseDsArray operation breadth vs dense numpy equivalents
(reference exercises CSR ops throughout tests/test_array.py; here
every op is checked against the same computation on the densified
matrix, including implicit-zero semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from dislib_spark.array.sparse import SparseDsArray, from_scipy_like

RNG = np.random.RandomState(11)


def _random_sparse(spark, n=12, d=8, density=0.3, seed=0):
    rng = np.random.RandomState(seed)
    M = rng.rand(n, d) * (rng.rand(n, d) < density)
    rows = []
    for i in range(n):
        idx = np.nonzero(M[i])[0]
        rows.append((i, [int(j) for j in idx], [float(M[i, j]) for j in idx]))
    return from_scipy_like(rows, (n, d), spark), M


def test_sparse_add_sub_multiply(spark):
    a, A = _random_sparse(spark, seed=1)
    b, B = _random_sparse(spark, seed=2)
    assert np.allclose((a + b).collect(), A + B)
    assert np.allclose((a - b).collect(), A - B)
    assert np.allclose(a.multiply(b).collect(), A * B)
    # cancellation: x - x has an all-implicit support
    diff = a - a
    assert diff.nnz() == 0
    assert np.allclose(diff.collect(), np.zeros(A.shape))


def test_sparse_transpose_and_slice(spark):
    a, A = _random_sparse(spark, seed=3)
    assert np.allclose(a.transpose().collect(), A.T)
    s = a[3:9]
    assert s.shape == (6, A.shape[1])
    assert np.allclose(s.collect(), A[3:9])
    with pytest.raises(NotImplementedError):
        a[::2]


def test_sparse_matmul(spark):
    a, A = _random_sparse(spark, n=10, d=6, seed=4)
    b, B = _random_sparse(spark, n=6, d=7, seed=5)
    out = a.matmul_sparse(b)
    assert isinstance(out, SparseDsArray)
    assert np.allclose(out.collect(), A @ B)
    W = RNG.rand(6, 3)
    dense = a.matmul_dense(W)
    assert np.allclose(dense.collect(), A @ W)


def test_sparse_reductions_implicit_zeros(spark):
    # an all-positive sparse column: its min must still be 0 (implicit)
    rows = [
        (0, [0, 2], [5.0, -1.0]),
        (1, [0], [3.0]),
        (2, [0, 1], [7.0, 2.0]),
    ]
    a = from_scipy_like(rows, (3, 3), spark)
    A = a.collect()
    assert np.allclose(a.sum(axis=0).collect().ravel(), A.sum(axis=0))
    mins = a.min(axis=0).collect().ravel()
    maxs = a.max(axis=0).collect().ravel()
    assert np.allclose(mins, A.min(axis=0))  # col0 min is 3.0? no — see below
    assert np.allclose(maxs, A.max(axis=0))
    # col 0 is fully stored (3 values) → min 3.0; col 1 sparse → min 0
    assert mins[1] == 0.0 and mins[2] == -1.0
    assert np.allclose(
        a.count_nonzero(axis=0).collect().ravel(), (A != 0).sum(axis=0)
    )
    assert np.allclose(
        a.count_nonzero(axis=1).collect().ravel(), (A != 0).sum(axis=1)
    )


def test_sparse_scalar_ops_and_norm(spark):
    a, A = _random_sparse(spark, seed=6)
    assert np.allclose((a * 2.5).collect(), A * 2.5)
    assert np.allclose((a / 2.0).collect(), A / 2.0)
    assert np.allclose((-a).collect(), -A)
    assert np.allclose(
        a.norm(axis=0).collect().ravel(), np.linalg.norm(A, axis=0)
    )
