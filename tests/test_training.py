"""Parameter-averaging distributed training (reference
encapsulated_functions_distributed.py) — convergence + exact
averaging math."""

from __future__ import annotations

import numpy as np
import pytest

from dislib_spark.training import (
    EncapsulatedFunctionsDistributed,
    ParameterAveragingTrainer,
)

RNG = np.random.RandomState(3)


@pytest.fixture(scope="module")
def lin_data(spark):
    X = RNG.rand(240, 3)
    w_true = np.array([2.0, -1.0, 0.5])
    y = X @ w_true + 0.3
    rows = [([float(v) for v in x], float(t)) for x, t in zip(X, y)]
    df = spark.createDataFrame(rows, "feat array<double>, target double")
    return X, y, df.repartition(4)


def _gd_step_factory(lr):
    def train_fn(params, X, y, epoch):
        w, b = params[0], float(params[1])
        pred = X @ w + b
        err = pred - y
        gw = X.T @ err / len(y)
        gb = float(err.mean())
        return [w - lr * gw, np.asarray(b - lr * gb)]

    return train_fn


def test_converges_to_ols(spark, lin_data):
    X, y, df = lin_data
    t = ParameterAveragingTrainer(
        [np.zeros(3), np.asarray(0.0)], _gd_step_factory(0.8), sync_every=1
    )
    w, b = t.fit(df, "feat", "target", num_epochs=400)
    # exact solution: w_true, intercept 0.3
    np.testing.assert_allclose(w, [2.0, -1.0, 0.5], atol=5e-2)
    assert abs(float(b) - 0.3) < 5e-2


def test_one_sync_step_equals_global_step(spark, lin_data):
    """Sample-weighted averaging of per-partition single full-batch
    gradient steps == ONE global full-batch step (linearity of the
    gradient) — pins the weighting math exactly."""
    X, y, df = lin_data
    lr = 0.1
    t = ParameterAveragingTrainer(
        [np.zeros(3), np.asarray(0.0)], _gd_step_factory(lr), sync_every=1
    )
    w, b = t.fit(df, "feat", "target", num_epochs=1)
    err = -y  # pred(0,0) - y
    want_w = -lr * (X.T @ err) / len(y)
    want_b = -lr * err.mean()
    np.testing.assert_allclose(w, want_w, atol=1e-12)
    np.testing.assert_allclose(float(b), want_b, atol=1e-12)


def test_sync_every_and_async_modes(spark, lin_data):
    X, y, df = lin_data

    def loss(params):
        w, b = params[0], float(params[1])
        return float(np.mean((X @ w + b - y) ** 2))

    enc = EncapsulatedFunctionsDistributed(num_workers=4).build(
        [np.zeros(3), np.asarray(0.0)], _gd_step_factory(0.5)
    )
    base = loss(enc.get_parameters())
    enc.fit_synchronous_every_n_epochs(
        df, "feat", "target", num_epochs=20, n_epochs_sync=5
    )
    mid = loss(enc.get_parameters())
    assert mid < base
    enc.fit_asynchronous(df, "feat", "target", num_epochs=10)
    assert loss(enc.get_parameters()) < mid


def test_shuffle_variant_runs(spark, lin_data):
    _, _, df = lin_data
    enc = EncapsulatedFunctionsDistributed(num_workers=3).build(
        [np.zeros(3), np.asarray(0.0)], _gd_step_factory(0.5)
    )
    out = enc.fit_synchronous_shuffle(df, "feat", "target", num_epochs=4)
    assert out[0].shape == (3,)


def test_feature_cols_list_form(spark):
    df = (
        spark.createDataFrame(
            [(1.0, 2.0, 5.0), (2.0, 0.0, 4.0), (0.0, 1.0, 1.0)],
            "a double, b double, t double",
        )
    )
    t = ParameterAveragingTrainer(
        [np.zeros(2), np.asarray(0.0)], _gd_step_factory(0.1)
    )
    w, b = t.fit(df, ["a", "b"], "t", num_epochs=2)
    assert w.shape == (2,)


def test_torch_adapter_gated():
    from dislib_spark.training.distributed import torch_train_fn

    with pytest.raises((ImportError, NotImplementedError)):
        torch_train_fn(lambda: None)
