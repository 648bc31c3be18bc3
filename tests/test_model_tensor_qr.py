"""Model save/load, DsTensor, QR/TSQR modes."""

from __future__ import annotations

import numpy as np
import pytest

import dislib_spark as ds
from dislib_spark.array.tensor import DsTensor, from_array, from_ds_array, random_tensors
from dislib_spark.cluster import KMeans
from dislib_spark.decomposition.qr import lanczos_svd, qr, random_svd, tsqr
from dislib_spark.preprocessing import StandardScaler
from dislib_spark.regression import LinearRegression
from dislib_spark.utils.model import load_model, save_model

RNG = np.random.RandomState(31)


def test_save_load_json_roundtrip(spark, tmp_path):
    X = RNG.randn(60, 3)
    yv = X @ [1.0, 2.0, 3.0] + 0.5
    x, y = ds.array(X, spark), ds.array(yv.reshape(-1, 1), spark)
    lr = LinearRegression().fit(x, y)
    save_model(lr, str(tmp_path / "lr.json"), save_format="json")
    lr2 = load_model(str(tmp_path / "lr.json"), load_format="json")
    assert np.allclose(lr2.coef_, lr.coef_)
    assert np.isclose(lr2.intercept_, lr.intercept_)
    # loaded model predicts identically
    assert np.allclose(
        lr2.predict(x).collect(), lr.predict(x).collect(), atol=1e-12
    )


def test_save_load_pickle_and_scaler(spark, tmp_path):
    X = RNG.randn(50, 4)
    x = ds.array(X, spark)
    sc = StandardScaler().fit(x)
    save_model(sc, str(tmp_path / "sc.pkl"), save_format="pickle")
    sc2 = load_model(str(tmp_path / "sc.pkl"), load_format="pickle")
    assert np.allclose(sc2.mean_, sc.mean_)
    assert np.allclose(sc2.scale_, sc.scale_)


def test_save_load_gmm_predict(spark, tmp_path):
    """Round-trip an estimator whose predict path CHECKS an excluded
    attribute (gmm._ml_model): _decode must restore dropped attrs as
    None, not leave them missing (AttributeError regression)."""
    from dislib_spark.cluster import GaussianMixture

    X = np.vstack([RNG.randn(40, 2), RNG.randn(40, 2) + 6])
    x = ds.array(X, spark)
    gm = GaussianMixture(n_components=2, random_state=3, max_iter=20).fit(x)
    save_model(gm, str(tmp_path / "gm.json"))
    gm2 = load_model(str(tmp_path / "gm.json"))
    assert gm2._ml_model is None
    assert np.allclose(
        gm2.predict(x).collect(), gm.predict(x).collect()
    )


def test_save_load_kmeans_centers(spark, tmp_path):
    X = RNG.randn(90, 2) + 4
    x = ds.array(X, spark)
    km = KMeans(n_clusters=3, init="k-means||", random_state=1).fit(x)
    save_model(km, str(tmp_path / "km.json"))
    km2 = load_model(str(tmp_path / "km.json"))
    # predict works via broadcast centers, no MLlib model needed
    assert np.allclose(
        km2.predict(x).collect(), km.predict(x).collect()
    )


def test_tensor_roundtrip_and_apply(spark):
    T = RNG.randn(6, 3, 4)
    t = from_array(T, spark)
    assert t.tensor_shape == (3, 4)
    assert np.allclose(t.collect(), T)

    doubled = t.apply_to_tensors(lambda a: a * 2)
    assert np.allclose(doubled.collect(), T * 2)

    summed = t.apply_to_tensors(lambda a: a.sum(axis=1))
    assert summed.tensor_shape == (3,)
    assert np.allclose(summed.collect(), T.sum(axis=2))

    arr = t.to_ds_array()
    assert arr.shape == (6, 12)
    assert np.allclose(arr.collect(), T.reshape(6, 12))

    back = from_ds_array(arr, (3, 4))
    assert np.allclose(back.collect(), T)


def test_random_tensors(spark):
    t = random_tensors(5, (2, 3), spark, random_state=8)
    vals = t.collect()
    assert vals.shape == (5, 2, 3)
    assert 0.0 <= vals.min() and vals.max() < 1.0


def test_qr_modes(spark):
    A = RNG.randn(40, 6)
    a = ds.array(A, spark)
    q_da, r = qr(a, mode="economic")
    Q = q_da.collect()
    assert np.allclose(Q @ r, A, atol=1e-8)
    r_only = qr(a, mode="r")
    assert np.allclose(np.abs(r_only), np.abs(r), atol=1e-8)

    # full mode: Q (n,n) orthogonal, R (n,d) upper triangular, QR=A
    # (reference tests/test_qr.py contract)
    qf, rf = qr(a, mode="full")
    assert qf.shape == (40, 40) and rf.shape == (40, 6)
    Qf = qf.collect()
    assert np.allclose(Qf @ Qf.T, np.eye(40), atol=1e-8)
    assert np.allclose(np.triu(rf), rf)
    assert np.allclose(Qf @ rf, A, atol=1e-8)

    q2, r2 = tsqr(a, mode="reduced_inverse")
    # the reference's _inverse modes return plain (Q, R) — its tests
    # (test_tsqr.py:204-243) assert triu(R) and Q.R = A, not inv(R)
    assert np.allclose(np.triu(r2), r2)
    assert np.allclose(q2.collect() @ r2, A, atol=1e-8)


def test_tsqr_mode_shapes(spark):
    """Per-mode shape contract (reference tests/test_tsqr.py asserts
    shapes): reduced modes return economic shapes; complete modes
    raise rather than silently returning the wrong (economic) shape."""
    A = RNG.randn(30, 4)
    a = ds.array(A, spark)
    q, r = tsqr(a, mode="reduced")
    assert q.shape == (30, 4) and r.shape == (4, 4)
    assert np.allclose(q.collect() @ r, A, atol=1e-8)
    r_only = tsqr(a, mode="r_reduced")
    assert r_only.shape == (4, 4)
    q2, r2 = tsqr(a, mode="reduced_inverse")
    assert q2.shape == (30, 4) and r2.shape == (4, 4)
    A_np = A
    for mode in ("complete", "complete_inverse"):
        qc, rc = tsqr(a, mode=mode)
        assert qc.shape == (30, 30) and rc.shape == (30, 4)
        Qc = qc.collect()
        assert np.allclose(Qc @ Qc.T, np.eye(30), atol=1e-8)
        assert np.allclose(np.triu(rc), rc)
        assert np.allclose(Qc @ rc, A_np, atol=1e-8)
    rc_only = tsqr(a, mode="r_complete")
    assert rc_only.shape == (30, 4)
    assert np.allclose(np.triu(rc_only), rc_only)
    with pytest.raises(ValueError):
        tsqr(a, mode="bogus")


def test_tsqr_complete_indexes_and_irregular(spark):
    """indexes= returns only the selected Q columns (reference
    tests/test_tsqr.py inverse_indexes contract) without the n^2
    materialization; irregular n (not a multiple of the block size or
    of d) still satisfies the full contract; wide (n<d) upper-
    trapezoidal R also holds."""
    A = RNG.randn(37, 5)  # irregular: 37 rows across parallelism
    a = ds.array(A, spark)
    qf, rf = tsqr(a, mode="complete")
    Qf = qf.collect()
    assert np.allclose(Qf @ Qf.T, np.eye(37), atol=1e-8)
    assert np.allclose(Qf @ rf, A, atol=1e-8)

    qi, ri = tsqr(a, mode="complete_inverse", indexes=[2, 3, 4])
    assert qi.shape == (37, 3)
    # selected columns match the full Q's columns
    assert np.allclose(qi.collect(), Qf[:, [2, 3, 4]], atol=1e-8)
    assert np.allclose(ri, rf)

    # reduced + indexes: economic Q column selection
    qr_red, _ = tsqr(a, mode="reduced", indexes=[0, 2])
    assert qr_red.shape == (37, 2)

    # wide case: n < d -> Q (n,n), R (n,d) upper trapezoidal
    W = RNG.randn(6, 9)
    w = ds.array(W, spark)
    qw, rw = tsqr(w, mode="complete")
    Qw = qw.collect()
    assert qw.shape == (6, 6) and rw.shape == (6, 9)
    assert np.allclose(Qw @ Qw.T, np.eye(6), atol=1e-8)
    assert np.allclose(np.triu(rw), rw)
    assert np.allclose(Qw @ rw, W, atol=1e-8)


def test_svd_aliases(spark):
    A = RNG.randn(50, 8)
    a = ds.array(A, spark)
    for fn in (lanczos_svd, random_svd):
        u, s, v = fn(a, 3)
        # leading singular values match numpy
        s_np = np.linalg.svd(A, compute_uv=False)[:3]
        assert np.allclose(s, s_np, atol=1e-6)


def test_tensor_load_dataset(spark, tmp_path):
    from dislib_spark.array.tensor import load_dataset

    tensors = [RNG.rand(2, 3) for _ in range(4)]
    d = tmp_path / "tds"
    d.mkdir()
    for i, t in enumerate(tensors):
        np.save(d / f"t{i}.npy", t)
    ds_t = load_dataset(spark, str(d))
    assert ds_t.n_tensors == 4
    assert ds_t.tensor_shape == (2, 3)
    assert np.allclose(ds_t.collect(), np.stack(tensors))
