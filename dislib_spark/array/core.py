"""DsArray — the engine's analogue of dislib's ds-array.

Reference: ``dislib/data/array.py:18-73`` (block-partitioned 2-D
array over PyCOMPSs futures). Spark-first redesign (SURVEY.md §1.4):

- storage is a DataFrame ``(row_id BIGINT, features ARRAY<DOUBLE>)``;
  Spark partitions replace row-blocks, laziness replaces futures.
- block geometry (``block_size`` / ``_reg_shape`` /
  ``rechunk``, reference array.py:1228-1245) is deliberately NOT part
  of the public API — partitioning is an execution concern handled by
  Spark/AQE.
- all elementwise/reduction work stays JVM-side via higher-order
  functions (``transform``/``zip_with``/``aggregate``) — no Python in
  the hot path.

Scale notes (100 TB target): rows are hash-partitioned by Spark on
read; every elementwise op is a narrow map (no shuffle); axis-0
reductions are partial-aggregated map-side then merged (one short
shuffle of d values per partition); matrix-matrix ops that genuinely
need co-location join on ``row_id``.
"""

from __future__ import annotations

import builtins
from collections.abc import Callable, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ROW = "row_id"
_FEAT = "features"


def _features_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField(_ROW, T.LongType(), False),
            T.StructField(_FEAT, T.ArrayType(T.DoubleType(), False), False),
        ]
    )


class DsArray:
    """Distributed 2-D numeric array over a Spark DataFrame.

    Mirrors the user-facing surface of ``dislib.data.array.Array``
    (indexing ``array.py:124-204``, arithmetic ``:206-376``,
    reductions ``:1100-1207``, transpose ``:1047-1098``, matmul
    ``:1650-1730``) without its block-geometry contract.
    """

    def __init__(self, df: DataFrame, shape: tuple[int, int]):
        self._df = df
        self._shape = (int(shape[0]), int(shape[1]))

    # -- metadata ------------------------------------------------------
    @property
    def shape(self) -> tuple[int, int]:
        return self._shape

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def spark(self) -> SparkSession:
        return self._df.sparkSession

    def __repr__(self) -> str:
        return f"DsArray(shape={self._shape})"

    # -- materialization (reference array.py:1263-1287 collect) --------
    def collect(self) -> np.ndarray:
        rows = self._df.orderBy(_ROW).collect()
        if not rows:
            return np.empty(self._shape)
        return np.array([r[_FEAT] for r in rows], dtype=np.float64)

    # -- indexing (reference array.py:124-204, 683-1045) ---------------
    def __getitem__(self, key):
        if isinstance(key, tuple):
            rows, cols = key
            return self._select_rows(rows)._select_cols(cols)
        return self._select_rows(key)

    def _select_rows(self, key) -> "DsArray":
        n = self._shape[0]
        if key is None or (isinstance(key, slice) and key == slice(None)):
            return self
        if isinstance(key, slice):
            start, stop, step = key.indices(n)
            if step != 1:
                raise NotImplementedError("strided row slicing not supported")
            df = self._df.where(
                (F.col(_ROW) >= start) & (F.col(_ROW) < stop)
            ).withColumn(_ROW, F.col(_ROW) - F.lit(start))
            return DsArray(df, (builtins.max(0, stop - start), self._shape[1]))
        if isinstance(key, (list, tuple, np.ndarray)):
            idx = [int(i) for i in key]
            order = {v: p for p, v in enumerate(idx)}
            mapping = F.create_map(
                *[F.lit(x) for kv in order.items() for x in kv]
            )
            df = (
                self._df.where(F.col(_ROW).isin(idx))
                .withColumn(_ROW, mapping[F.col(_ROW)].cast("long"))
            )
            return DsArray(df, (len(idx), self._shape[1]))
        i = int(key)
        if i < 0:
            i += n
        df = self._df.where(F.col(_ROW) == i).withColumn(_ROW, F.lit(0).cast("long"))
        return DsArray(df, (1, self._shape[1]))

    def _select_cols(self, key) -> "DsArray":
        d = self._shape[1]
        if key is None or (isinstance(key, slice) and key == slice(None)):
            return self
        if isinstance(key, slice):
            start, stop, step = key.indices(d)
            if step != 1:
                raise NotImplementedError("strided column slicing not supported")
            expr = F.slice(F.col(_FEAT), start + 1, builtins.max(0, stop - start))
            width = builtins.max(0, stop - start)
        elif isinstance(key, (list, tuple, np.ndarray)):
            idx = [int(j) for j in key]
            expr = F.array(*[F.element_at(F.col(_FEAT), j + 1) for j in idx])
            width = len(idx)
        else:
            j = int(key)
            if j < 0:
                j += d
            expr = F.array(F.element_at(F.col(_FEAT), j + 1))
            width = 1
        df = self._df.select(_ROW, expr.alias(_FEAT))
        return DsArray(df, (self._shape[0], width))

    # -- elementwise arithmetic (reference array.py:206-376) -----------
    def _map_elements(self, fn) -> "DsArray":
        """Apply a column-expression fn to every element (narrow map,
        whole-stage-codegen'd; reference _apply_elementwise
        array.py:2304-2313)."""
        df = self._df.select(
            _ROW, F.transform(F.col(_FEAT), fn).alias(_FEAT)
        )
        return DsArray(df, self._shape)

    def _zip_elements(self, other: "DsArray", fn) -> "DsArray":
        """Elementwise binary op via row_id join + zip_with (reference
        matadd array.py:1985-2052)."""
        if self._shape != other._shape:
            raise ValueError(f"shape mismatch {self._shape} vs {other._shape}")
        a = self._df
        b = other._df.withColumnRenamed(_FEAT, "_rhs")
        df = a.join(b, _ROW).select(
            _ROW, F.zip_with(F.col(_FEAT), F.col("_rhs"), fn).alias(_FEAT)
        )
        return DsArray(df, self._shape)

    def __add__(self, other):
        if isinstance(other, DsArray):
            return self._zip_elements(other, lambda x, y: x + y)
        return self._map_elements(lambda x: x + F.lit(float(other)))

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, DsArray):
            return self._zip_elements(other, lambda x, y: x - y)
        return self._map_elements(lambda x: x - F.lit(float(other)))

    def __rsub__(self, other):
        return self._map_elements(lambda x: F.lit(float(other)) - x)

    def __mul__(self, other):
        if isinstance(other, DsArray):
            return self._zip_elements(other, lambda x, y: x * y)
        return self._map_elements(lambda x: x * F.lit(float(other)))

    def __rmul__(self, other):
        return self.__mul__(other)

    def __truediv__(self, other):
        if isinstance(other, DsArray):
            return self._zip_elements(other, lambda x, y: x / y)
        return self._map_elements(lambda x: x / F.lit(float(other)))

    def __pow__(self, exponent):
        return self._map_elements(lambda x: F.pow(x, F.lit(float(exponent))))

    def __neg__(self):
        return self._map_elements(lambda x: -x)

    def __matmul__(self, other: "DsArray") -> "DsArray":
        from dislib_spark.array.linalg import matmul

        return matmul(self, other)

    # -- elementwise math (reference array.py:1880-1950, 1209-1226) ----
    def exp(self) -> "DsArray":
        return self._map_elements(lambda c: F.exp(c))

    def log(self) -> "DsArray":
        return self._map_elements(lambda c: F.log(c))

    def sqrt(self) -> "DsArray":
        return self._map_elements(lambda c: F.sqrt(c))

    # -- reductions (reference array.py:1100-1207) ----------------------
    def _axis0_agg(self, make_expr) -> "DsArray":
        """Per-column reduction: d independent agg expressions over
        element_at — one pass, map-side partial agg, no explode."""
        d = self._shape[1]
        exprs = [
            make_expr(F.element_at(F.col(_FEAT), j + 1)).alias(f"c{j}")
            for j in range(d)
        ]
        row = self._df.agg(*exprs)
        df = row.select(
            F.lit(0).cast("long").alias(_ROW),
            F.array(*[F.col(f"c{j}").cast("double") for j in range(d)]).alias(_FEAT),
        )
        return DsArray(df, (1, d))

    def _axis1_agg(self, agg_expr_fn) -> "DsArray":
        df = self._df.select(
            _ROW, F.array(agg_expr_fn(F.col(_FEAT)).cast("double")).alias(_FEAT)
        )
        return DsArray(df, (self._shape[0], 1))

    def sum(self, axis: int = 0) -> "DsArray":
        if axis == 0:
            return self._axis0_agg(F.sum)
        return self._axis1_agg(
            lambda c: F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x)
        )

    def mean(self, axis: int = 0) -> "DsArray":
        if axis == 0:
            return self._axis0_agg(F.avg)
        n = self._shape[1]
        return self._axis1_agg(
            lambda c: F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x)
            / F.lit(float(n))
        )

    def min(self, axis: int = 0) -> "DsArray":
        if axis == 0:
            return self._axis0_agg(F.min)
        return self._axis1_agg(F.array_min)

    def max(self, axis: int = 0) -> "DsArray":
        if axis == 0:
            return self._axis0_agg(F.max)
        return self._axis1_agg(F.array_max)

    def median(self, axis: int = 0) -> "DsArray":
        """Exact median (reference array.py:1160-1182; dense only
        there, always available here)."""
        if axis == 0:
            return self._axis0_agg(lambda c: F.percentile(c, F.lit(0.5)))
        return self._axis1_agg(_array_median)

    def norm(self, axis: int = 0) -> "DsArray":
        """Column/row 2-norm (reference array.py:1184-1207)."""
        if axis == 0:
            out = self._axis0_agg(lambda c: F.sum(c * c))
            return out._map_elements(F.sqrt)
        return self._axis1_agg(
            lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))
        )

    # -- structure ------------------------------------------------------
    def transpose(self) -> "DsArray":
        from dislib_spark.array.linalg import transpose

        return transpose(self)

    @property
    def T(self) -> "DsArray":
        return self.transpose()

    def copy(self) -> "DsArray":
        """No-op: DataFrames are immutable (reference array.py:1247
        needed a deep block copy)."""
        return DsArray(self._df, self._shape)

    def rechunk(self, block_size: tuple[int, int]) -> "DsArray":
        """Re-partition into row blocks of ``block_size[0]`` rows
        (reference array.py:1228-1245 ``rechunk``). Value-identity;
        the physical translation of "block size" here is PARTITION
        granularity: a range-partition on row_id into ⌈n/b⌉ chunks —
        contiguous row ranges per partition, exactly the reference's
        row-block layout. The column component is accepted and
        ignored (row-oriented storage has no column blocks); same
        ValueError contract for oversized blocks."""
        b = int(block_size[0])
        n, d = self._shape
        if b > n or int(block_size[1]) > d:
            raise ValueError(
                "The block size requested for rechunk "
                "is greater than the ds-array"
            )
        parts = max(1, -(-n // b))
        return DsArray(
            self._df.repartitionByRange(parts, F.col(_ROW)), self._shape
        )

    # -- assignment as immutable rewrite (reference __setitem__
    #    array.py:162-204, _set_column :719-748) ----------------------
    def set_element(self, i: int, j: int, value: float) -> "DsArray":
        """A[i, j] = v as a conditional projection (narrow map)."""
        feat = F.transform(
            F.col(_FEAT),
            lambda x, idx: F.when(
                (F.col(_ROW) == i) & (idx == j), F.lit(float(value))
            ).otherwise(x),
        )
        return DsArray(self._df.select(_ROW, feat.alias(_FEAT)), self._shape)

    def set_column(self, j: int, values: "DsArray") -> "DsArray":
        """A[:, j] = vec via row_id join + positional rewrite."""
        v = values.df.select(
            _ROW, F.element_at(F.col(_FEAT), 1).alias("_new")
        )
        joined = self._df.join(v, _ROW)
        feat = F.transform(
            F.col(_FEAT),
            lambda x, idx: F.when(idx == j, F.col("_new")).otherwise(x),
        )
        return DsArray(joined.select(_ROW, feat.alias(_FEAT)), self._shape)

    def delete_rows(self, idx: list[int]) -> "DsArray":
        """reference delete(i=...) array.py:1307-1358: anti-filter +
        dense re-keying."""
        drop = sorted(int(i) for i in idx)
        kept = self._df.where(~F.col(_ROW).isin(drop))
        # new_id = old_id - (#dropped below old_id): closed-form rank
        # shift, no shuffle (drop list is a broadcast literal)
        shift = sum(
            (F.col(_ROW) > d).cast("long") for d in drop
        )
        df = kept.select((F.col(_ROW) - shift).alias(_ROW), _FEAT)
        return DsArray(df, (self._shape[0] - len(drop), self._shape[1]))

    def delete_columns(self, idx: list[int]) -> "DsArray":
        """reference delete(j=...) array.py:1307-1358."""
        drop = {int(j) for j in idx}
        keep = [j for j in range(self._shape[1]) if j not in drop]
        return self._select_cols(keep)

    def gammaln(self) -> "DsArray":
        """log-gamma elementwise (reference array.py:1928-1950 uses
        scipy.special.gammaln). No JVM/scipy lgamma here → Arrow-
        batched pandas UDF over math.lgamma (stdlib)."""
        import math

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _lg(col):
            return col.map(lambda arr: [math.lgamma(v) for v in arr])

        udf = pandas_udf(_lg, "array<double>")
        return DsArray(
            self._df.select(_ROW, udf(F.col(_FEAT)).alias(_FEAT)), self._shape
        )


def _array_median(c):
    """Exact median of an array column, JVM-side: sort + midpoint."""
    s = F.array_sort(c)
    n = F.size(c)
    lo = F.element_at(s, ((n + 1) / 2).cast("int"))
    hi = F.element_at(s, (n / 2 + 1).cast("int"))
    return (lo + hi) / F.lit(2.0)


# ---------------------------------------------------------------------
# creation ops (reference data/array.py:1361-1574)
# ---------------------------------------------------------------------
def array(
    x, spark: SparkSession | None = None, num_partitions: int | None = None
) -> DsArray:
    """Ingest an in-memory 2-D array (reference ds.array,
    array.py:1361-1410). Local data → driver createDataFrame; at scale
    data arrives via I/O readers instead."""
    spark = spark or SparkSession.getActiveSession()
    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 2:
        raise ValueError("DsArray is 2-dimensional")
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    df = spark.createDataFrame(rows, _features_schema())
    if num_partitions:
        df = df.repartition(num_partitions)
    return DsArray(df, x.shape)


def random_array(
    shape: tuple[int, int],
    spark: SparkSession | None = None,
    random_state: int = 0,
) -> DsArray:
    """Uniform [0,1) random matrix (reference array.py:1413-1434).
    One JVM-side rand stream per column — fully distributed, no
    driver materialization."""
    spark = spark or SparkSession.getActiveSession()
    n, d = shape
    cols = F.array(*[F.rand(random_state + j) for j in range(d)])
    df = spark.range(n).select(F.col("id").alias(_ROW), cols.alias(_FEAT))
    return DsArray(df, (n, d))


def _constant_array(
    shape: tuple[int, int], value: float, spark: SparkSession | None
) -> DsArray:
    spark = spark or SparkSession.getActiveSession()
    n, d = shape
    feat = F.array_repeat(F.lit(float(value)), d)
    df = spark.range(n).select(F.col("id").alias(_ROW), feat.alias(_FEAT))
    return DsArray(df, (n, d))


def zeros(shape, spark=None) -> DsArray:
    """reference array.py:1512-1529."""
    return _constant_array(shape, 0.0, spark)


def full(shape, fill_value, spark=None) -> DsArray:
    """reference array.py:1555-1574."""
    return _constant_array(shape, fill_value, spark)


def eye(n_rows: int, n_cols: int | None = None, spark=None) -> DsArray:
    """Diagonal generator (reference array.py:1462-1509): lazy
    projection over spark.range, no data movement."""
    spark = spark or SparkSession.getActiveSession()
    n_cols = n_cols if n_cols is not None else n_rows
    feat = F.transform(
        F.sequence(F.lit(0), F.lit(n_cols - 1)),
        lambda j: F.when(j == F.col(_ROW), 1.0).otherwise(0.0),
    )
    df = spark.range(n_rows).select(F.col("id").alias(_ROW), feat.alias(_FEAT))
    return DsArray(df, (n_rows, n_cols))


def identity(n: int, spark=None) -> DsArray:
    """reference array.py:1437-1459."""
    return eye(n, n, spark)


# ---------------------------------------------------------------------
# concatenation (reference array.py:2054-2227)
# ---------------------------------------------------------------------
def concat_rows(a: DsArray, b: DsArray) -> DsArray:
    """Vertical concat = UNION ALL with shifted row ids (reference
    concat_rows array.py:2128-2227)."""
    if a.shape[1] != b.shape[1]:
        raise ValueError("column count mismatch")
    shifted = b.df.select(
        (F.col(_ROW) + F.lit(a.shape[0])).alias(_ROW), _FEAT
    )
    return DsArray(a.df.unionAll(shifted), (a.shape[0] + b.shape[0], a.shape[1]))


def concat_columns(a: DsArray, b: DsArray) -> DsArray:
    """Horizontal concat = positional equi-join on row_id (reference
    concat_columns array.py:2054-2126). Sort-merge/broadcast join
    picked by Catalyst."""
    if a.shape[0] != b.shape[0]:
        raise ValueError("row count mismatch")
    rhs = b.df.withColumnRenamed(_FEAT, "_rhs")
    df = a.df.join(rhs, _ROW).select(
        _ROW, F.concat(F.col(_FEAT), F.col("_rhs")).alias(_FEAT)
    )
    return DsArray(df, (a.shape[0], a.shape[1] + b.shape[1]))


# ---------------------------------------------------------------------
# generic per-axis UDF (reference apply_along_axis, array.py:1577-1647)
# ---------------------------------------------------------------------
def apply_along_axis(
    func: Callable[[np.ndarray], float | Sequence[float]],
    axis: int,
    arr: DsArray,
) -> DsArray:
    """Arbitrary numpy reduction per row (axis=1) or per column
    (axis=0) — the reference's generic UDAF (array.py:1577-1647).

    axis=1: Arrow-batched pandas UDF over the features column (one
    narrow map). axis=0: posexplode → per-column group → applyInPandas
    (d-way parallel; the full column must be visible to an arbitrary
    ``func``, so a shuffle on col_idx is inherent).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if axis == 1:

        def _row_apply(feats):
            return feats.map(lambda v: float(func(np.asarray(v))))

        _row_udf = pandas_udf(_row_apply, "double")

        df = arr.df.select(
            _ROW, F.array(_row_udf(F.col(_FEAT))).alias(_FEAT)
        )
        return DsArray(df, (arr.shape[0], 1))

    if axis == 0:
        exploded = arr.df.select(
            F.posexplode(F.col(_FEAT)).alias("col_idx", "v")
        )

        def _col_apply(pdf: pd.DataFrame) -> pd.DataFrame:
            out = func(pdf["v"].to_numpy())
            return pd.DataFrame(
                {"col_idx": [int(pdf["col_idx"].iloc[0])], "res": [float(out)]}
            )

        res = exploded.groupBy("col_idx").applyInPandas(
            _col_apply, "col_idx int, res double"
        )
        row = res.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("col_idx", "res"))),
                lambda s: s["res"],
            ).alias(_FEAT)
        )
        df = row.select(F.lit(0).cast("long").alias(_ROW), _FEAT)
        return DsArray(df, (1, arr.shape[1]))

    raise ValueError("axis must be 0 or 1")
