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


# --- fake-torch adapter coverage -------------------------------------
# A numpy-backed stand-in implementing exactly the torch surface
# torch_train_fn touches (tensor/no_grad/nn.MSELoss/optim.SGD plus a
# Linear model with analytic MSE gradients), so the pack → minibatch
# SGD → unpack contract runs in CI without torch in the container.


class _FT:
    def __init__(self, arr):
        self.data = np.array(arr, dtype=np.float64)
        self.grad = None

    @property
    def shape(self):
        return self.data.shape

    def copy_(self, other):
        self.data[...] = other.data

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.data.copy()


class _FakeLinear:
    """y = X @ W + b with hand-derived MSE gradients."""

    def __init__(self, d):
        self.W = _FT(np.zeros((d, 1)))
        self.b = _FT(np.zeros(1))

    def parameters(self):
        return [self.W, self.b]

    def __call__(self, xb):
        return (self, xb)


class _FakeMSE:
    def __call__(self, out, yb):
        model, xb = out

        class _Loss:
            def backward(_self):
                X, y = xb.data, yb.data
                err = X @ model.W.data + model.b.data - y
                n = X.shape[0]
                model.W.grad = 2.0 / n * (X.T @ err)
                model.b.grad = 2.0 / n * err.sum(axis=0)

        return _Loss()


class _FakeSGD:
    def __init__(self, params, lr):
        self.ps = list(params)
        self.lr = lr

    def zero_grad(self):
        for p in self.ps:
            p.grad = None

    def step(self):
        for p in self.ps:
            if p.grad is not None:
                p.data -= self.lr * p.grad


def _fake_torch():
    import contextlib
    from types import SimpleNamespace

    return SimpleNamespace(
        tensor=lambda arr, dtype=None: _FT(arr),
        no_grad=contextlib.nullcontext,
        nn=SimpleNamespace(MSELoss=_FakeMSE),
        optim=SimpleNamespace(SGD=_FakeSGD),
    )


def test_torch_pack_unpack_roundtrip_and_shape_guard():
    from dislib_spark.training.distributed import (
        torch_pack_params,
        torch_unpack_params,
    )

    ft = _fake_torch()
    m = _FakeLinear(3)
    params = [np.arange(3.0).reshape(3, 1), np.asarray([7.0])]
    torch_pack_params(m, params, ft)
    got = torch_unpack_params(m)
    assert all(np.array_equal(a, b) for a, b in zip(got, params))
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_pack_params(m, [np.zeros((2, 1)), np.zeros(1)], ft)
    with pytest.raises(ValueError, match="parameter tensors"):
        torch_pack_params(m, [np.zeros((3, 1))], ft)


def test_torch_train_fn_minibatch_sgd_converges():
    """The adapter's full contract — pack trainer arrays, run
    minibatch SGD epochs, unpack — drives a fake-torch linear model
    to the known OLS solution."""
    from dislib_spark.training.distributed import torch_train_fn

    rng = np.random.RandomState(5)
    X = rng.rand(200, 2)
    w_true = np.array([[1.5], [-2.0]])
    y = (X @ w_true + 0.25).ravel()

    fn = torch_train_fn(
        lambda: _FakeLinear(2), loss_name="mse", lr=0.2,
        batch_size=32, torch_mod=_fake_torch(),
    )
    params = [np.zeros((2, 1)), np.zeros(1)]
    for epoch in range(300):
        params = fn(params, X, y, epoch)
    assert np.allclose(params[0], w_true, atol=0.05)
    assert abs(float(params[1][0]) - 0.25) < 0.05


def test_torch_train_fn_rejects_unknown_loss():
    from dislib_spark.training.distributed import torch_train_fn

    with pytest.raises(ValueError, match="loss_name"):
        torch_train_fn(
            lambda: _FakeLinear(1), loss_name="hinge",
            torch_mod=_fake_torch(),
        )


def test_torch_train_fn_casts_batches_to_model_dtype():
    """Real float32 modules must receive float32 batches: the adapter
    reads the module's parameter dtype and passes it to every
    t.tensor() batch build (ADVICE r4: float64 batches raise a dtype
    mismatch in real torch)."""
    from dislib_spark.training.distributed import torch_train_fn

    fake = _fake_torch()
    seen = []
    orig = fake.tensor
    fake.tensor = lambda arr, dtype=None: (
        seen.append(dtype), orig(arr))[1]

    m = _FakeLinear(2)
    m.W.dtype = "float32"
    m.b.dtype = "float32"
    fn = torch_train_fn(lambda: m, torch_mod=fake, batch_size=16)
    X = np.random.RandomState(0).rand(40, 2)
    y = X @ np.array([1.0, 2.0])
    fn([np.zeros((2, 1)), np.zeros(1)], X, y, 0)
    # first 2 tensor() calls are torch_pack_params (copy_ casts those
    # inside the module); every BATCH build must carry the model dtype
    batch_dtypes = seen[2:]
    assert batch_dtypes and all(d == "float32" for d in batch_dtypes)
