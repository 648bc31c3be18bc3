"""Model persistence.

Reference: ``dislib/data/util/model.py`` — save_model/load_model to
JSON/CBOR/pickle with future synchronization (``sync_obj`` :56-73)
and ndarray/ds-array encoders (:20-53).

Spark-first: estimator state is driver-side numpy/scalars (our
estimators collect fitted parameters); MLlib-backed models delegate
to MLlib's own writers. JSON for portability, pickle for fidelity;
CBOR is gated on the optional dependency like the reference.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import numpy as np


def _encode(obj: Any) -> Any:
    """JSON encoder mirroring reference model.py:20-38 (ndarray /
    RandomState / nested estimator support)."""
    if isinstance(obj, np.ndarray):
        return {
            "_type": "ndarray",
            "dtype": str(obj.dtype),
            "data": obj.tolist(),
        }
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.random.RandomState):
        state = obj.get_state()
        return {
            "_type": "random_state",
            "state": [state[0], state[1].tolist(), *state[2:]],
        }
    if hasattr(obj, "__dict__") and not isinstance(obj, type):
        def _keep(k: str) -> bool:
            return not k.startswith("_ml") and k != "model" and k != "_model"

        return {
            "_type": "estimator",
            "class": f"{type(obj).__module__}.{type(obj).__qualname__}",
            "state": {k: _encode(v) for k, v in vars(obj).items() if _keep(k)},
            # record what was excluded so _decode can restore the
            # attributes as None — a loaded estimator must not raise
            # AttributeError on e.g. `self._ml_model is not None`
            "dropped": [k for k in vars(obj) if not _keep(k)],
        }
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_encode(v) for v in obj]
    return obj


def _decode(obj: Any) -> Any:
    if isinstance(obj, dict):
        t = obj.get("_type")
        if t == "ndarray":
            return np.array(obj["data"], dtype=obj["dtype"])
        if t == "random_state":
            rs = np.random.RandomState()
            s = obj["state"]
            rs.set_state((s[0], np.array(s[1], dtype=np.uint32), *s[2:]))
            return rs
        if t == "estimator":
            module, _, qual = obj["class"].rpartition(".")
            import importlib

            cls = getattr(importlib.import_module(module), qual)
            inst = cls.__new__(cls)
            for k, v in obj["state"].items():
                setattr(inst, k, _decode(v))
            # attributes excluded at encode time (Spark-side handles)
            # come back as None, matching the unfitted sentinel
            for k in obj.get("dropped", ()):
                setattr(inst, k, None)
            return inst
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj


def save_model(model: Any, path: str, save_format: str = "json") -> None:
    """reference data/util/model.py save_model: json | cbor | pickle."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if save_format == "json":
        with open(path, "w") as f:
            json.dump(_encode(model), f)
    elif save_format == "pickle":
        with open(path, "wb") as f:
            pickle.dump(model, f)
    elif save_format == "cbor":
        try:
            import cbor2
        except ImportError as e:  # pragma: no cover — optional, like reference
            raise ImportError("cbor2 not installed") from e
        with open(path, "wb") as f:
            cbor2.dump(_encode(model), f)
    else:
        raise ValueError(f"unknown save_format {save_format}")


def load_model(path: str, load_format: str = "json") -> Any:
    """reference data/util/model.py load_model."""
    if load_format == "json":
        with open(path) as f:
            return _decode(json.load(f))
    if load_format == "pickle":
        with open(path, "rb") as f:
            return pickle.load(f)
    if load_format == "cbor":
        try:
            import cbor2
        except ImportError as e:  # pragma: no cover
            raise ImportError("cbor2 not installed") from e
        with open(path, "rb") as f:
            return _decode(cbor2.load(f))
    raise ValueError(f"unknown load_format {load_format}")
