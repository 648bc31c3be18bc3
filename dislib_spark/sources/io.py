"""I/O: loaders and sinks.

Reference: ``dislib/data/io.py`` — load_svmlight_file (:15-75),
load_txt_file (:77-135), load_npy_file (:137-181), load_npy_files
(:361-403), load_mdcrd_file (:183-227), save_txt (:308-333),
save_npy_file (:335-359).

Spark-first: every loader returns a DsArray backed by a distributed
scan (``spark.read.format(...)``); block_size is gone from the
public contract (partitioning is Spark's). Parquet is the canonical
sink.
"""

from __future__ import annotations

import io as _io
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW
from dislib_spark.utils.base import with_global_index


def _with_row_ids(df: DataFrame, value_col: str, n: int | None = None) -> DsArray:
    """Attach dense row ids (order = input order), JVM-side."""
    out = with_global_index(df, None, _ROW).select(
        _ROW, F.col(value_col).cast("array<double>").alias(_FEAT)
    )
    count = n if n is not None else out.count()
    width = len(out.first()[_FEAT]) if count else 0
    return DsArray(out, (count, width))


def load_txt_file(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    discard_first_row: bool = False,
    col_of_index: bool = False,
) -> DsArray:
    """Delimited text → DsArray (reference data/io.py:77-135)."""
    df = spark.read.csv(
        path, header=discard_first_row, inferSchema=False, sep=delimiter
    )
    cols = df.columns[1:] if col_of_index else df.columns
    arr = df.select(
        F.array(*[F.col(c).cast("double") for c in cols]).alias("vals")
    )
    return _with_row_ids(arr, "vals")


def load_svmlight_file(
    spark: SparkSession, path: str, n_features: int
) -> tuple[DsArray, DsArray]:
    """SVMLight/libsvm text → (X dense DsArray, y (n,1) DsArray)
    (reference data/io.py:15-75). Uses Spark's native libsvm source
    (sparse vectors), densified into the array column."""
    from pyspark.ml.functions import vector_to_array

    df = spark.read.format("libsvm").option("numFeatures", n_features).load(path)
    feats = df.select(vector_to_array(F.col("features")).alias("vals"), "label")
    wide = with_global_index(feats, None, _ROW).select(
        _ROW,
        F.col("vals").cast("array<double>").alias(_FEAT),
        F.col("label").cast("double").alias("_y"),
    ).cache()
    n = wide.count()
    x = DsArray(wide.select(_ROW, _FEAT), (n, n_features))
    y = DsArray(
        wide.select(_ROW, F.array(F.col("_y")).alias(_FEAT)), (n, 1)
    )
    return x, y


def _parse_npy(content: bytes) -> np.ndarray:
    arr = np.load(_io.BytesIO(content), allow_pickle=False)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    return arr


def load_npy_file(spark: SparkSession, path: str) -> DsArray:
    """Single .npy (C-order 2D) → DsArray (reference data/io.py:
    137-181): binaryFile scan + Arrow-batched decode — rows stream
    out of the executor-side parse, never through the driver."""
    import pandas as pd

    bin_df = spark.read.format("binaryFile").load(path)

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                arr = _parse_npy(bytes(content))
                yield pd.DataFrame({"vals": [row.tolist() for row in arr.astype(float)]})

    rows = bin_df.select("content").mapInPandas(decode, "vals array<double>")
    return _with_row_ids(rows, "vals")


def load_npy_files(spark: SparkSession, path: str) -> DsArray:
    """Directory of row-consistent .npy shards stacked by rows
    (reference data/io.py:361-403). Files sorted by path (the
    reference's deterministic order) via per-file offsets."""
    import pandas as pd

    bin_df = spark.read.format("binaryFile").load(path + "/*.npy")

    def decode(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                arr = _parse_npy(bytes(content))
                yield pd.DataFrame(
                    {
                        "path": [str(p)] * len(arr),
                        "idx": range(len(arr)),
                        "vals": [row.tolist() for row in arr.astype(float)],
                    }
                )

    rows = bin_df.select("path", "content").mapInPandas(
        decode, "path string, idx long, vals array<double>"
    )
    ordered = rows.orderBy("path", "idx")
    return _with_row_ids(ordered, "vals")


def load_hstack_npy_files(spark: SparkSession, path: str) -> DsArray:
    """Directory of .npy shards stacked BY COLUMNS (reference
    data/io.py:229-306): each file holds the same rows, different
    column slices; files sorted by path."""
    import pandas as pd

    bin_df = spark.read.format("binaryFile").load(path + "/*.npy")

    def decode(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                arr = _parse_npy(bytes(content))
                yield pd.DataFrame(
                    {
                        "path": [str(p)] * len(arr),
                        "idx": range(len(arr)),
                        "vals": [row.tolist() for row in arr.astype(float)],
                    }
                )

    rows = bin_df.select("path", "content").mapInPandas(
        decode, "path string, idx long, vals array<double>"
    )
    # concat column slices per row index, in path order
    assembled = rows.groupBy("idx").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("path", "vals"))),
                lambda s: s["vals"],
            )
        ).alias(_FEAT)
    )
    out = assembled.select(F.col("idx").alias(_ROW), _FEAT)
    n = out.count()
    width = len(out.first()[_FEAT]) if n else 0
    return DsArray(out, (n, width))


def load_mdcrd_file(
    spark: SparkSession, path: str, n_atoms: int
) -> DsArray:
    """AMBER mdcrd trajectory text → (snapshots × 3·n_atoms) DsArray
    (reference data/io.py:183-227): spark.read.text + JVM-side
    split/posexplode regrouping into fixed-width snapshots."""
    values_per_row = 3 * n_atoms
    lines = spark.read.text(path)
    # contiguous line index (input/file order) so the title line is
    # EXACTLY index 0 — the previous monotonically_increasing_id() > 0
    # filter only worked because partition 0/offset 0 happens to get
    # raw id 0, an undocumented layout detail.
    nums = (
        with_global_index(lines, None, "line_id")
        .where(F.col("line_id") > 0)
        .select(
            "line_id",
            F.posexplode(
                F.split(F.trim(F.col("value")), r"\s+")
            ).alias("pos", "v"),
        )
        .where(F.col("v") != "")
    )
    # global value index via (line_id, pos) ordering
    cells = with_global_index(
        nums.select("line_id", "pos", F.col("v").cast("double").alias("v")),
        ["line_id", "pos"],
        "_g",
    ).select(
        F.expr(f"_g DIV {values_per_row}").alias("snap"),
        F.pmod("_g", F.lit(values_per_row)).alias("k"),
        "v",
    )
    rows = cells.groupBy("snap").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("k", "v"))), lambda s: s["v"]
        ).alias(_FEAT)
    )
    out = rows.select(F.col("snap").alias(_ROW), _FEAT)
    n = out.count()
    return DsArray(out, (n, values_per_row))


# ---------------------------------------------------------------------
# sinks (reference save_txt io.py:308-333, save_npy io.py:335-359)
# ---------------------------------------------------------------------
def save_parquet(arr: DsArray, path: str) -> None:
    """Canonical sink (replaces per-block .npy)."""
    arr.df.write.mode("overwrite").parquet(path)


def _as_ds_array(df) -> DsArray:
    """Shared sink-reader tail: shape discovery + facade wrap."""
    n = df.count()
    width = len(df.first()[_FEAT]) if n else 0
    return DsArray(df.select(_ROW, _FEAT), (n, width))


def load_parquet(spark: SparkSession, path: str) -> DsArray:
    return _as_ds_array(spark.read.parquet(path))


def save_txt(arr: DsArray, path: str, delimiter: str = ",") -> None:
    """Text sink: one CSV part per partition (reference io.py:308-333
    wrote one file per block)."""
    flat = arr.df.orderBy(_ROW).select(
        F.array_join(
            F.transform(F.col(_FEAT), lambda v: v.cast("string")), delimiter
        ).alias("line")
    )
    flat.write.mode("overwrite").text(path)


def save_json(arr: DsArray, path: str) -> None:
    """JSON-lines sink — interchange format for systems that can't
    read parquet; one object per row (row_id + features array)."""
    arr.df.write.mode("overwrite").json(path)


def load_json(spark: SparkSession, path: str) -> DsArray:
    """Read a :func:`save_json` sink back (schema pinned — JSON
    inference would widen ints and break round-trips)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(_ROW, LongType()),
            StructField(_FEAT, ArrayType(DoubleType())),
        ]
    )
    return _as_ds_array(spark.read.schema(schema).json(path))


def save_orc(arr: DsArray, path: str) -> None:
    """ORC sink (columnar interchange with Hive-ecosystem stacks)."""
    arr.df.write.mode("overwrite").orc(path)


def load_orc(spark: SparkSession, path: str) -> DsArray:
    return _as_ds_array(spark.read.orc(path))


def load_blocks_rechunk(
    blocks,
    shape: tuple[int, int],
    block_size: tuple[int, int],
    new_block_size: tuple[int, int],
    spark: SparkSession | None = None,
) -> DsArray:
    """Assemble a DsArray from a flat row-major list of numpy blocks,
    then :meth:`DsArray.rechunk` it to ``new_block_size`` (reference
    ``data/io.py:405-444`` — its blocks are COMPSs futures, ours are
    local ndarrays; the grid layout ``blocks[i*n_cols + j]`` and the
    oversized-block ValueError are identical). Block geometry maps to
    partition granularity (see rechunk).

    Divergence (deliberate): the grid is ``ceil(shape/block_size)``
    blocks per dimension, where the reference floors — identical for
    the divisible shapes the reference's callers use, but a
    non-divisible ``shape`` keeps its trailing partial blocks here
    instead of silently dropping the last block row/column."""
    import numpy as np

    from dislib_spark.array.core import array as ds_array

    if shape[0] < new_block_size[0] or shape[1] < new_block_size[1]:
        raise ValueError(
            "The block size requested for rechunk "
            "is greater than the ds-array"
        )
    spark = spark or SparkSession.getActiveSession()
    n_rows = -(-shape[0] // block_size[0])
    n_cols = -(-shape[1] // block_size[1])
    grid = [
        [np.asarray(blocks[i * n_cols + j]) for j in range(n_cols)]
        for i in range(n_rows)
    ]
    full = np.block(grid)
    if full.shape != tuple(shape):
        full = full[: shape[0], : shape[1]]
    return ds_array(full, spark).rechunk(new_block_size)
