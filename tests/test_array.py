"""DsArray ops vs numpy (mirrors the reference's test_array.py
oracle style: np.allclose over random shapes)."""

from __future__ import annotations

import numpy as np
import pytest

import dislib_spark as ds

RNG = np.random.RandomState(7)


@pytest.fixture(scope="module")
def mats(spark):
    A = RNG.rand(23, 7)
    B = RNG.rand(23, 7)
    return A, B, ds.array(A, spark), ds.array(B, spark)


def test_creation_and_collect(spark, mats):
    A, _, a, _ = mats
    assert a.shape == (23, 7)
    assert np.allclose(a.collect(), A)


def test_zeros_full_eye(spark):
    assert np.allclose(ds.zeros((4, 3), spark).collect(), np.zeros((4, 3)))
    assert np.allclose(ds.full((3, 5), 2.5, spark).collect(), np.full((3, 5), 2.5))
    assert np.allclose(ds.eye(4, 6, spark).collect(), np.eye(4, 6))
    assert np.allclose(ds.identity(5, spark).collect(), np.eye(5))


def test_random_array_distribution(spark):
    x = ds.random_array((500, 3), spark, random_state=9).collect()
    assert x.shape == (500, 3)
    assert 0.0 <= x.min() and x.max() < 1.0
    assert abs(x.mean() - 0.5) < 0.05
    # deterministic under same seed
    y = ds.random_array((500, 3), spark, random_state=9).collect()
    assert np.allclose(x, y)


def test_elementwise_arithmetic(spark, mats):
    A, B, a, b = mats
    assert np.allclose((a + b).collect(), A + B)
    assert np.allclose((a - b).collect(), A - B)
    assert np.allclose((a * b).collect(), A * B)
    assert np.allclose((a / b).collect(), A / B)
    assert np.allclose((a + 2.0).collect(), A + 2)
    assert np.allclose((3.0 - a).collect(), 3 - A)
    assert np.allclose((a**2).collect(), A**2)
    assert np.allclose((-a).collect(), -A)
    assert np.allclose(a.exp().collect(), np.exp(A))
    assert np.allclose(a.log().collect(), np.log(A))
    assert np.allclose(a.sqrt().collect(), np.sqrt(A))


def test_reductions(spark, mats):
    A, _, a, _ = mats
    for axis in (0, 1):
        assert np.allclose(a.sum(axis).collect().ravel(), A.sum(axis))
        assert np.allclose(a.mean(axis).collect().ravel(), A.mean(axis))
        assert np.allclose(a.min(axis).collect().ravel(), A.min(axis))
        assert np.allclose(a.max(axis).collect().ravel(), A.max(axis))
        assert np.allclose(
            a.median(axis).collect().ravel(), np.median(A, axis)
        )
        assert np.allclose(
            a.norm(axis).collect().ravel(),
            np.linalg.norm(A, axis=axis),
        )


def test_indexing(spark, mats):
    A, _, a, _ = mats
    assert np.allclose(a[3].collect(), A[3:4])
    assert np.allclose(a[2:9].collect(), A[2:9])
    assert np.allclose(a[[1, 5, 2]].collect(), A[[1, 5, 2]])
    assert np.allclose(a[:, 1:4].collect(), A[:, 1:4])
    assert np.allclose(a[:, [0, 6, 3]].collect(), A[:, [0, 6, 3]])
    assert np.allclose(a[4:9, 2:5].collect(), A[4:9, 2:5])


def test_concat(spark, mats):
    A, B, a, b = mats
    assert np.allclose(ds.concat_rows(a, b).collect(), np.vstack([A, B]))
    assert np.allclose(ds.concat_columns(a, b).collect(), np.hstack([A, B]))


def test_matmul_transpose_kron(spark):
    A = RNG.rand(6, 4)
    B = RNG.rand(4, 5)
    a, b = ds.array(A, spark), ds.array(B, spark)
    assert np.allclose(ds.matmul(a, b).collect(), A @ B)
    assert np.allclose(
        ds.matmul(a, a, transpose_a=True).collect(), A.T @ A
    )
    assert np.allclose(ds.matmul_sql(a, b).collect(), A @ B)
    assert np.allclose(ds.transpose(a).collect(), A.T)
    # every dispatch strategy agrees: gram (AᵀB packed partials),
    # broadcast-local (small B), forced BlockMatrix, and AᵀBᵀ
    b2 = ds.array(RNG.rand(6, 5), spark)
    assert np.allclose(
        ds.matmul(a, b2, transpose_a=True).collect(), A.T @ b2.collect()
    )
    assert np.allclose(
        ds.matmul(a, b, strategy="blocks").collect(), A @ B
    )
    bt = ds.array(B.T, spark)
    assert np.allclose(
        ds.matmul(a, bt, transpose_b=True).collect(), A @ B
    )
    C2 = RNG.rand(3, 6)
    c2 = ds.array(C2, spark)
    assert np.allclose(
        ds.matmul(a, c2, transpose_a=True, transpose_b=True).collect(),
        A.T @ C2.T,
    )
    C = RNG.rand(2, 3)
    D = RNG.rand(3, 2)
    c, d = ds.array(C, spark), ds.array(D, spark)
    assert np.allclose(ds.kron(c, d).collect(), np.kron(C, D))


def test_svd_and_qr(spark):
    A = RNG.rand(30, 5)
    a = ds.array(A, spark)
    u, s, v = ds.svd(a)
    # reconstruction
    recon = u.collect() @ np.diag(s) @ v.T
    assert np.allclose(recon, A, atol=1e-8)
    assert np.all(np.diff(s) <= 1e-12)  # descending

    q, r = ds.qr_economic(a)
    Q = q.collect()
    assert np.allclose(Q @ r, A, atol=1e-8)
    assert np.allclose(Q.T @ Q, np.eye(5), atol=1e-8)
    assert np.allclose(np.triu(r), r, atol=1e-10)


def test_apply_along_axis(spark):
    A = RNG.rand(12, 4)
    a = ds.array(A, spark)
    r1 = ds.apply_along_axis(np.ptp, 1, a)
    assert np.allclose(r1.collect().ravel(), np.ptp(A, axis=1))
    r0 = ds.apply_along_axis(np.ptp, 0, a)
    assert np.allclose(r0.collect().ravel(), np.ptp(A, axis=0))


def test_setitem_delete_gammaln(spark):
    A = RNG.rand(10, 5)
    a = ds.array(A, spark)

    b = a.set_element(2, 3, 99.0)
    B = A.copy()
    B[2, 3] = 99.0
    assert np.allclose(b.collect(), B)

    col = ds.array(np.arange(10, dtype=float).reshape(-1, 1), spark)
    c = a.set_column(1, col)
    C = A.copy()
    C[:, 1] = np.arange(10)
    assert np.allclose(c.collect(), C)

    d_ = a.delete_rows([1, 4, 7])
    assert d_.shape == (7, 5)
    assert np.allclose(d_.collect(), np.delete(A, [1, 4, 7], axis=0))

    e = a.delete_columns([0, 2])
    assert e.shape == (10, 3)
    assert np.allclose(e.collect(), np.delete(A, [0, 2], axis=1))

    import math
    g = a.gammaln().collect()
    expected = np.vectorize(math.lgamma)(A)
    assert np.allclose(g, expected, atol=1e-12)


def test_terasort(spark):
    from dislib_spark.sorting import TeraSort, terasort

    A = RNG.rand(8, 4)
    a = ds.array(A, spark)
    flat_sorted = terasort(a).collect()
    assert np.allclose(flat_sorted.ravel(), np.sort(A.ravel()))

    per_col = TeraSort(column_indexes=[1, 3]).fit(a).sort(a)
    P = A.copy()
    P[:, 1] = np.sort(A[:, 1])
    P[:, 3] = np.sort(A[:, 3])
    assert np.allclose(per_col.collect(), P)


def test_hstack_npy(spark, tmp_path):
    from dislib_spark.sources import load_hstack_npy_files

    parts = [RNG.rand(6, 2), RNG.rand(6, 3)]
    d = tmp_path / "h"
    d.mkdir()
    for i, p in enumerate(parts):
        np.save(d / f"{i}.npy", p)
    x = load_hstack_npy_files(spark, str(d))
    assert x.shape == (6, 5)
    assert np.allclose(x.collect(), np.hstack(parts))


def test_pad_and_remove_last(spark, mats):
    A, _, a, _ = mats
    # pad bottom rows + right columns with a constant
    padded = ds.pad(a, ((0, 3), (0, 2)), constant_value=7.5)
    want = np.pad(
        A, ((0, 3), (0, 2)), mode="constant", constant_values=7.5
    )
    assert padded.shape == (26, 9)
    assert np.allclose(padded.collect(), want)
    # top/left padding matches the reference's NotImplementedError
    with pytest.raises(NotImplementedError):
        ds.pad(a, ((1, 0), (0, 0)))
    with pytest.raises(NotImplementedError):
        ds.pad(a, ((0, 0), (2, 0)))
    # geometry regularization is the identity here
    assert ds.pad_last_blocks_with_zeros(a) is a
    # remove_last_rows / remove_last_columns invert the padding
    trimmed = ds.remove_last_columns(ds.remove_last_rows(padded, 3), 2)
    assert trimmed.shape == (23, 7)
    assert np.allclose(trimmed.collect(), A)
    # zero/negative counts are no-ops; removing all columns raises
    assert ds.remove_last_rows(a, 0) is a
    with pytest.raises(ValueError):
        ds.remove_last_columns(a, 7)


def test_reference_toplevel_function_forms(spark, mats):
    """dislib exposes matadd/matsubtract/exp/log/gammaln as MODULE
    functions (dislib/__init__.py) — reference code must port
    verbatim through the same names here."""
    A, B, a, b = mats
    assert np.allclose(ds.matadd(a, b).collect(), A + B)
    assert np.allclose(ds.matsubtract(a, b).collect(), A - B)
    assert np.allclose(ds.exp(a).collect(), np.exp(A))
    assert np.allclose(ds.log(a).collect(), np.log(A))
    import math

    want = np.vectorize(math.lgamma)(A)
    assert np.allclose(ds.gammaln(a).collect(), want)
