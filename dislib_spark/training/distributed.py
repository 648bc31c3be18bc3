"""Distributed data-parallel training via parameter averaging.

Reference: ``dislib/pytorch/encapsulated_functions_distributed.py``
(601 LoC: synchronous / every-n-epochs / asynchronous trainings that
ship a torch model to each worker, train on that worker's shard, and
average parameters — ``pt_aggregateParameters`` at lines 10-52) and
the EDDL twin ``dislib/eddl/encapsulate_function_distributed.py``.

Spark-first redesign — ONE framework-agnostic trainer instead of two
framework-bound wrappers × 8 fit variants:

- the model is an opaque list of numpy arrays (``params``); the user
  supplies ``train_fn(params, X, y, epoch) -> params`` which runs ONE
  local training pass over a shard. Torch/EDDL/scikit models plug in
  by flattening their weights into that list (see
  ``torch_train_fn`` below for the gated torch adapter).
- each sync round is one Arrow job: broadcast the current params
  (small — model weights), ``mapInArrow`` over the cached training
  DataFrame so every partition trains on its co-located shard, emit
  (flattened delta-weights, sample count) per partition, then the
  driver computes the sample-weighted average. This is exactly the
  reference's train-then-``pt_aggregateParameters`` loop with Spark
  partitions as the workers.
- the reference's three modes collapse into ``sync_every``:
  ``sync_every=1`` = fit_synchronous, ``sync_every=n`` =
  fit_synchronous_every_n_epochs (workers run n local epochs between
  averages), ``sync_every=num_epochs`` = fit_asynchronous (one final
  average). The *_shuffle_* variants map to ``shuffle=True`` (a
  seeded repartition between rounds — Spark's shuffle replaces the
  reference's ``dislib.data.tensor.shuffle``).

Scale (100 TB): parameters move driver→executor once per round via
broadcast (model-sized, not data-sized); data never moves except the
optional shuffle; the per-round result is num_partitions × |params|
floats — a classic AllReduce implemented as partial-per-partition +
driver combine. For models too large for a driver average, shard the
parameter vector (not implemented — out of scope for the reference's
model sizes).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

ParamList = "list[np.ndarray]"


def _flatten(params) -> np.ndarray:
    return np.concatenate([np.asarray(p, dtype=np.float64).ravel() for p in params])


def _unflatten(flat: np.ndarray, shapes: list[tuple]) -> list[np.ndarray]:
    out, off = [], 0
    for s in shapes:
        n = int(np.prod(s, dtype=np.int64)) if s else 1
        out.append(np.asarray(flat[off : off + n]).reshape(s))
        off += n
    return out


class ParameterAveragingTrainer:
    """Synchronous local-SGD with periodic sample-weighted averaging.

    ``train_fn(params, X, y, epoch)`` must be cloudpickle-able and
    return an updated list of arrays with the SAME shapes. ``X`` is a
    2-D float ndarray of the partition's rows; ``y`` a 1-D ndarray
    (zeros when the dataset has no labels).
    """

    def __init__(
        self,
        init_params,
        train_fn: Callable,
        sync_every: int = 1,
        shuffle: bool = False,
        seed: int = 0,
    ):
        self.params = [np.asarray(p, dtype=np.float64) for p in init_params]
        self.train_fn = train_fn
        self.sync_every = max(1, int(sync_every))
        self.shuffle = bool(shuffle)
        self.seed = int(seed)

    def fit(
        self,
        df: DataFrame,
        feature_cols: list[str] | str,
        label_col: str | None = None,
        num_epochs: int = 1,
        num_workers: int | None = None,
    ) -> list[np.ndarray]:
        """Train for ``num_epochs``, averaging every ``sync_every``
        epochs (reference fit_synchronous* family). Returns the final
        parameter list (also stored on ``self.params``)."""
        from pyspark.sql import functions as F

        if isinstance(feature_cols, str):
            feats = F.col(feature_cols).cast("array<double>").alias("_x")
        else:
            feats = F.array(
                *[F.col(c).cast("double") for c in feature_cols]
            ).alias("_x")
        lab = (
            F.col(label_col).cast("double")
            if label_col
            else F.lit(0.0)
        ).alias("_y")
        data = df.select(feats, lab)
        if num_workers:
            data = data.repartition(num_workers)
        data = data.cache()
        try:
            rounds = -(-num_epochs // self.sync_every)
            epoch = 0
            for r in range(rounds):
                n_local = min(self.sync_every, num_epochs - epoch)
                if self.shuffle and r > 0:
                    # seeded re-shuffle of rows across workers between
                    # rounds (reference *_shuffle_* variants)
                    data = data.repartition(
                        data.rdd.getNumPartitions(),
                        F.xxhash64("_x", F.lit(self.seed + r)),
                    )
                self.params = self._one_round(data, epoch, n_local)
                epoch += n_local
            return self.params
        finally:
            data.unpersist()

    def _one_round(self, data: DataFrame, epoch0: int, n_local: int):
        shapes = [p.shape for p in self.params]
        flat0 = _flatten(self.params)
        train_fn = self.train_fn
        sc = data.sparkSession.sparkContext
        bc = sc.broadcast((flat0, shapes, epoch0, n_local))

        def shard_train(batches):
            flat, shp, ep0, nloc = bc.value
            xs, ys = [], []
            for b in batches:
                tbl = pa.Table.from_batches([b])
                xs.extend(tbl.column("_x").to_pylist())
                ys.extend(tbl.column("_y").to_pylist())
            if not xs:
                return
            X = np.asarray(xs, dtype=np.float64)
            y = np.asarray(ys, dtype=np.float64)
            p = _unflatten(flat.copy(), shp)
            for e in range(nloc):
                p = train_fn(p, X, y, ep0 + e)
            out = pa.RecordBatch.from_pydict(
                {
                    "w": pa.array([_flatten(p).tolist()],
                                  type=pa.list_(pa.float64())),
                    "n": pa.array([len(xs)], type=pa.int64()),
                }
            )
            yield out

        partials = data.mapInArrow(
            shard_train, "w array<double>, n bigint"
        ).collect()
        if not partials:
            return self.params
        weights = np.array([r["n"] for r in partials], dtype=np.float64)
        stacked = np.stack([np.asarray(r["w"]) for r in partials])
        avg = (stacked * weights[:, None]).sum(axis=0) / weights.sum()
        return _unflatten(avg, shapes)


class EncapsulatedFunctionsDistributed:
    """Name-parity facade over :class:`ParameterAveragingTrainer`
    exposing the reference's fit-variant surface
    (encapsulated_functions_distributed.py:130-601). All variants are
    the same loop with different (sync_every, shuffle) settings; the
    GPU suffix is dropped — device placement belongs to the user's
    ``train_fn`` (or Spark's resource profiles), not the API."""

    def __init__(self, num_workers: int | None = None):
        self.num_workers = num_workers
        self.model_parameters = None
        self._train_fn = None

    def build(self, init_params, train_fn, **_ignored):
        """Store initial params + the per-shard training function
        (reference build(); optimizer/loss live inside train_fn)."""
        self.model_parameters = [
            np.asarray(p, dtype=np.float64) for p in init_params
        ]
        self._train_fn = train_fn
        return self

    def get_parameters(self):
        return self.model_parameters

    def _fit(self, df, feature_cols, label_col, num_batches, num_epochs,
             sync_every, shuffle):
        t = ParameterAveragingTrainer(
            self.model_parameters, self._train_fn,
            sync_every=sync_every, shuffle=shuffle,
        )
        self.model_parameters = t.fit(
            df, feature_cols, label_col, num_epochs,
            num_workers=self.num_workers,
        )
        return self.model_parameters

    def fit_synchronous(self, df, feature_cols, label_col,
                        num_batches_per_worker=1, num_epochs=1):
        return self._fit(df, feature_cols, label_col,
                         num_batches_per_worker, num_epochs, 1, False)

    def fit_synchronous_shuffle(self, df, feature_cols, label_col,
                                num_batches_per_worker=1, num_epochs=1):
        return self._fit(df, feature_cols, label_col,
                         num_batches_per_worker, num_epochs, 1, True)

    def fit_synchronous_every_n_epochs(self, df, feature_cols, label_col,
                                       num_batches_per_worker=1,
                                       num_epochs=1, n_epochs_sync=1):
        return self._fit(df, feature_cols, label_col,
                         num_batches_per_worker, num_epochs,
                         n_epochs_sync, False)

    def fit_synchronous_shuffle_every_n_epochs(self, df, feature_cols,
                                               label_col,
                                               num_batches_per_worker=1,
                                               num_epochs=1,
                                               n_epochs_sync=1):
        return self._fit(df, feature_cols, label_col,
                         num_batches_per_worker, num_epochs,
                         n_epochs_sync, True)

    def fit_asynchronous(self, df, feature_cols, label_col,
                         num_batches_per_worker=1, num_epochs=1):
        # one average at the very end (reference fit_asynchronous_*)
        return self._fit(df, feature_cols, label_col,
                         num_batches_per_worker, num_epochs,
                         num_epochs, False)


def torch_pack_params(model, params, torch_mod):
    """Copy the trainer's numpy parameter list into a torch module's
    parameters, in ``model.parameters()`` order (the reference ships
    whole state_dicts; the trainer's contract is positional arrays).
    Shapes must match 1:1."""
    mps = list(model.parameters())
    if len(mps) != len(params):
        raise ValueError(
            f"model has {len(mps)} parameter tensors, trainer holds "
            f"{len(params)}"
        )
    with torch_mod.no_grad():
        for p_t, p_np in zip(mps, params):
            if tuple(p_t.shape) != tuple(np.asarray(p_np).shape):
                raise ValueError(
                    f"parameter shape mismatch: model {tuple(p_t.shape)}"
                    f" vs trainer {np.asarray(p_np).shape}"
                )
            p_t.copy_(torch_mod.tensor(np.asarray(p_np, dtype=np.float64)))


def torch_unpack_params(model) -> list:
    """Torch module parameters → the trainer's numpy list (same
    order/shapes as ``torch_pack_params`` wrote)."""
    return [
        np.asarray(p.detach().cpu().numpy(), dtype=np.float64)
        for p in model.parameters()
    ]


def torch_train_fn(model_builder, loss_name: str = "mse",
                   lr: float = 0.01, batch_size: int = 32,
                   torch_mod=None):
    """Adapter producing a ``train_fn`` that trains a torch module on
    each shard (reference PytorchDistributed, pytorch_distributed.py):
    pack the trainer's arrays into a freshly-built module, run
    minibatch SGD over the shard, unpack back to arrays. Pure local
    compute — the distribution (broadcast / shard / average) stays in
    :class:`ParameterAveragingTrainer`.

    ``torch_mod`` injects the torch implementation; the default
    imports real torch (ImportError-gated in containers without it).
    Tests drive the full pack → minibatch-SGD → unpack contract with
    a numpy-backed fake (tests/test_training.py), so the import gate
    is not the only coverage."""
    t = torch_mod
    if t is None:  # pragma: no cover - torch absent in this container
        try:
            import torch as t
        except ImportError as e:
            raise ImportError(
                "torch_train_fn requires pytorch; install torch or "
                "supply a numpy train_fn instead"
            ) from e
    loss_cls = {
        "mse": "MSELoss",
        "l1": "L1Loss",
        "bce": "BCEWithLogitsLoss",
    }
    if loss_name not in loss_cls:
        raise ValueError(
            f"loss_name must be one of {sorted(loss_cls)}, got "
            f"{loss_name!r}"
        )

    def train_fn(params, X, y, epoch):
        model = model_builder()
        torch_pack_params(model, params, t)
        loss_fn = getattr(t.nn, loss_cls[loss_name])()
        opt = t.optim.SGD(model.parameters(), lr=lr)
        # Precision contract: batches are cast to the MODULE's own
        # parameter dtype — a standard float32 module must see
        # float32 batches (real torch raises a mat-mul dtype
        # mismatch on float64 inputs). The trainer's arrays stay
        # float64 outside the module; per-shard precision is bounded
        # by the module dtype, not the adapter.
        p0 = next(iter(model.parameters()), None)
        dt = getattr(p0, "dtype", None)
        n = X.shape[0]
        for start in range(0, n, batch_size):
            xb = t.tensor(np.asarray(X[start:start + batch_size],
                                     dtype=np.float64), dtype=dt)
            yb = t.tensor(
                np.asarray(y[start:start + batch_size],
                           dtype=np.float64).reshape(-1, 1),
                dtype=dt,
            )
            opt.zero_grad()
            loss = loss_fn(model(xb), yb)
            loss.backward()
            opt.step()
        return torch_unpack_params(model)

    return train_fn
