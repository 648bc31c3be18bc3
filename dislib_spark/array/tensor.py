"""DsTensor — distributed n-dimensional tensor collection.

Reference: ``dislib/data/tensor.py:18-63`` (2-D grid of torch/numpy
chunks with tensor_shape/dtype metadata; torch-optional) and its
creation/converter surface (:522-1035).

Spark-first: a DataFrame ``(tensor_id BIGINT, shape ARRAY<INT>,
data ARRAY<DOUBLE>)`` — one row per tensor chunk, data flattened
C-order. Per-chunk compute is Arrow-batched ``mapInPandas`` (the
reference's ``apply_to_tensors``, tensor.py:502-520); torch is
optional exactly as in the reference (numpy is the lingua franca).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "tensor_id long, shape array<int>, data array<double>"


class DsTensor:
    """Collection of same-rank tensors, one per row."""

    def __init__(self, df: DataFrame, n_tensors: int, tensor_shape: tuple[int, ...]):
        self._df = df
        self.n_tensors = int(n_tensors)
        self.tensor_shape = tuple(int(s) for s in tensor_shape)

    @property
    def df(self) -> DataFrame:
        return self._df

    def __repr__(self) -> str:
        return f"DsTensor(n={self.n_tensors}, shape={self.tensor_shape})"

    def collect(self) -> np.ndarray:
        """(n_tensors, *tensor_shape) ndarray."""
        rows = self._df.orderBy("tensor_id").collect()
        return np.array(
            [np.array(r["data"]).reshape(r["shape"]) for r in rows]
        )

    def apply_to_tensors(self, func: Callable[[np.ndarray], np.ndarray]) -> "DsTensor":
        """reference tensor.py:502-520 — arbitrary per-chunk function,
        Arrow-batched. Output shape probed on a driver-side dummy."""
        import pandas as pd

        probe = func(np.zeros(self.tensor_shape))
        out_shape = tuple(int(s) for s in np.asarray(probe).shape)

        def run(batches):
            for pdf in batches:
                outs, shapes = [], []
                for shape, data in zip(pdf["shape"], pdf["data"]):
                    t = np.array(data).reshape(list(shape))
                    r = np.asarray(func(t), dtype=np.float64)
                    outs.append(r.ravel().tolist())
                    shapes.append(list(r.shape))
                yield pd.DataFrame(
                    {
                        "tensor_id": pdf["tensor_id"],
                        "shape": shapes,
                        "data": outs,
                    }
                )

        df = self._df.mapInPandas(run, _SCHEMA)
        return DsTensor(df, self.n_tensors, out_shape)

    def to_ds_array(self):
        """reference tensor.py from_ds_array inverse (:614-666):
        flatten each tensor to a row of a DsArray."""
        from dislib_spark.array.core import DsArray, _FEAT, _ROW

        width = int(np.prod(self.tensor_shape))
        df = self._df.select(
            F.col("tensor_id").alias(_ROW), F.col("data").alias(_FEAT)
        )
        return DsArray(df, (self.n_tensors, width))


def from_array(x: np.ndarray, spark: SparkSession | None = None) -> DsTensor:
    """reference tensor.py:522-567 — first axis indexes tensors."""
    spark = spark or SparkSession.getActiveSession()
    x = np.asarray(x, dtype=np.float64)
    shape = list(x.shape[1:])
    rows = [
        (i, shape, x[i].ravel().tolist())
        for i in range(x.shape[0])
    ]
    return DsTensor(
        spark.createDataFrame(rows, _SCHEMA), x.shape[0], tuple(shape)
    )


def random_tensors(
    n_tensors: int,
    tensor_shape: tuple[int, ...],
    spark: SparkSession | None = None,
    random_state: int = 0,
) -> DsTensor:
    """reference tensor.py:902-922 — distributed generation: one
    seeded rand stream per flattened element (JVM-side)."""
    spark = spark or SparkSession.getActiveSession()
    width = int(np.prod(tensor_shape))
    data = F.array(*[F.rand(random_state + j) for j in range(width)])
    df = spark.range(n_tensors).select(
        F.col("id").alias("tensor_id"),
        F.array(*[F.lit(int(s)) for s in tensor_shape]).alias("shape"),
        data.alias("data"),
    )
    return DsTensor(df, n_tensors, tensor_shape)


def from_ds_array(arr, tensor_shape: tuple[int, ...]) -> DsTensor:
    """reference tensor.py:614-666 — each DsArray row becomes one
    tensor of tensor_shape (row width must match prod(shape))."""
    from dislib_spark.array.core import _FEAT, _ROW

    width = int(np.prod(tensor_shape))
    if arr.shape[1] != width:
        raise ValueError(
            f"row width {arr.shape[1]} != prod(tensor_shape) {width}"
        )
    df = arr.df.select(
        F.col(_ROW).alias("tensor_id"),
        F.array(*[F.lit(int(s)) for s in tensor_shape]).alias("shape"),
        F.col(_FEAT).alias("data"),
    )
    return DsTensor(df, arr.shape[0], tensor_shape)


def load_dataset(
    spark: SparkSession, path: str, glob: str = "*.npy"
) -> DsTensor:
    """Directory of .npy files → DsTensor, one tensor per file
    (reference tensor.py:973-1035 load_dataset; torch .pt variant is
    covered by from_pt_tensor). binaryFile scan + executor-side
    decode; files keyed by sorted path order."""
    import io as _io

    import pandas as pd

    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )

    def decode(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                arr = np.load(_io.BytesIO(bytes(content)), allow_pickle=False)
                arr = np.asarray(arr, dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "path": [str(p)],
                        "shape": [list(arr.shape)],
                        "data": [arr.ravel().tolist()],
                    }
                )

    decoded = bin_df.select("path", "content").mapInPandas(
        decode, "path string, shape array<int>, data array<double>"
    )
    from dislib_spark.utils.base import with_global_index

    df = with_global_index(decoded, ["path"], "tensor_id").select(
        "tensor_id", "shape", "data"
    )
    first = df.first()
    n = df.count()
    return DsTensor(df, n, tuple(first["shape"]) if first else ())


def from_pt_tensor(t, spark: SparkSession | None = None) -> DsTensor:
    """reference tensor.py:569-612 — torch optional, like the
    reference's import guard (dislib/__init__.py:6-11)."""
    try:
        import torch  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError("torch not installed") from e
    return from_array(t.detach().cpu().numpy(), spark)
