"""SparseDsArray — sparse counterpart of DsArray.

Reference: dislib's per-array sparse flag with scipy CSR blocks
(``dislib/data/array.py:49-50, 1377-1380``; svmlight loader's
``store_sparse``, ``data/io.py:15-75``).

Spark-first: one row per sample, features as parallel
``indices ARRAY<INT>`` / ``values ARRAY<DOUBLE>`` columns (CSR row
layout relationally). Elementwise ops touch only stored values
(narrow maps); axis-0 reductions explode to (col, v) cells — the
shuffle is proportional to nnz, not n·d. Estimator hand-off via
MLlib SparseVector without densifying.

Densification contract (every op below stays sparse unless noted):

- stays sparse: scalar *, /, **, neg; + - multiply (sparse∘sparse);
  transpose; matmul_sparse (SpGEMM); row slices; count_nonzero.
- densifies BY NATURE: ``matmul_dense`` (sparse @ dense is dense),
  ``sum/mean/norm/min/max`` (reduced axis vectors are dense),
  ``to_dense`` (explicit).
- never implicit: no op silently converts the full matrix; the only
  full-densify is the explicit ``to_dense()``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ROW = "row_id"


class SparseDsArray:
    """Distributed sparse 2-D array: (row_id, indices, values)."""

    def __init__(self, df: DataFrame, shape: tuple[int, int]):
        self._df = df
        self._shape = (int(shape[0]), int(shape[1]))

    @property
    def shape(self) -> tuple[int, int]:
        return self._shape

    @property
    def df(self) -> DataFrame:
        return self._df

    def __repr__(self) -> str:
        return f"SparseDsArray(shape={self._shape})"

    # -- materialization ----------------------------------------------
    def collect(self) -> np.ndarray:
        rows = self._df.orderBy(_ROW).collect()
        out = np.zeros(self._shape)
        for r in rows:
            out[r[_ROW], list(r["indices"])] = list(r["values"])
        return out

    def to_dense(self):
        """→ DsArray (reference's sparse→dense toggle)."""
        from dislib_spark.array.core import DsArray, _FEAT

        d = self._shape[1]
        # scatter values into a dense zero array, JVM-side
        feat = F.aggregate(
            F.arrays_zip(F.col("indices"), F.col("values")),
            F.array_repeat(F.lit(0.0), d),
            lambda acc, iv: F.transform(
                acc,
                lambda x, pos: F.when(
                    pos == iv["indices"], iv["values"]
                ).otherwise(x),
            ),
        )
        df = self._df.select(_ROW, feat.alias(_FEAT))
        return DsArray(df, self._shape)

    def to_ml_df(self) -> DataFrame:
        """(row_id, _v SparseVector) for MLlib estimators — never
        densifies. RDD route: VectorUDT cannot ride Arrow batches
        (mapInPandas rejects UDT output), and MLlib's own converters
        use the same row path."""
        from pyspark.ml.linalg import SparseVector, VectorUDT
        from pyspark.sql.types import LongType, StructField, StructType

        d = self._shape[1]
        schema = StructType(
            [
                StructField(_ROW, LongType(), False),
                StructField("_v", VectorUDT(), False),
            ]
        )
        rdd = self._df.rdd.map(
            lambda r: (r[0], SparseVector(d, list(r[1]), list(r[2])))
        )
        return self._df.sparkSession.createDataFrame(rdd, schema)

    # -- elementwise on stored values ---------------------------------
    def _map_values(self, fn) -> "SparseDsArray":
        df = self._df.select(
            _ROW, "indices", F.transform(F.col("values"), fn).alias("values")
        )
        return SparseDsArray(df, self._shape)

    def __mul__(self, scalar: float):
        return self._map_values(lambda v: v * F.lit(float(scalar)))

    __rmul__ = __mul__

    def __truediv__(self, scalar: float):
        return self._map_values(lambda v: v / F.lit(float(scalar)))

    def __pow__(self, e: float):
        return self._map_values(lambda v: F.pow(v, F.lit(float(e))))

    def __neg__(self):
        return self._map_values(lambda v: -v)

    # -- reductions ----------------------------------------------------
    def _cells(self) -> DataFrame:
        return self._df.select(
            _ROW,
            F.explode(F.arrays_zip(F.col("indices"), F.col("values"))).alias("iv"),
        ).select(
            _ROW,
            F.col("iv.indices").alias("j"),
            F.col("iv.values").alias("v"),
        )

    def sum(self, axis: int = 0):
        from dislib_spark.array.core import DsArray, _FEAT

        if axis == 0:
            # nnz-proportional shuffle; absent columns sum to 0
            sums = self._cells().groupBy("j").agg(F.sum("v").alias("s"))
            rows = sums.collect()
            vec = np.zeros(self._shape[1])
            for r in rows:
                vec[r["j"]] = r["s"]
            spark = self._df.sparkSession
            df = spark.createDataFrame(
                [(0, vec.tolist())], f"{_ROW} long, {_FEAT} array<double>"
            )
            return DsArray(df, (1, self._shape[1]))
        df = self._df.select(
            _ROW,
            F.array(
                F.aggregate(F.col("values"), F.lit(0.0), lambda a, v: a + v)
            ).alias(_FEAT),
        )
        return DsArray(df, (self._shape[0], 1))

    def mean(self, axis: int = 0):
        out = self.sum(axis)
        denom = float(self._shape[0] if axis == 0 else self._shape[1])
        return out * (1.0 / denom)

    def norm(self, axis: int = 0):
        sq = self._map_values(lambda v: v * v).sum(axis)
        return sq._map_elements(lambda c: F.sqrt(c))

    def nnz(self) -> int:
        return int(
            self._df.agg(
                F.coalesce(F.sum(F.size("values")), F.lit(0)).alias("n")
            ).collect()[0]["n"]
        )

    # -- sparse/sparse elementwise (nnz-proportional shuffles) --------
    @staticmethod
    def _from_cells(cells: DataFrame, shape) -> "SparseDsArray":
        """(row_id, j, v) cells → CSR rows: one groupBy(row) shuffle,
        column order restored by array_sort on (j, v) structs. Rows
        with no surviving cells are dropped (all-zero CSR rows are
        implicit, same as the reference's CSR blocks)."""
        rows = (
            cells.where(F.col("v") != 0.0)
            .groupBy(_ROW)
            .agg(
                F.array_sort(F.collect_list(F.struct("j", "v"))).alias("_jv")
            )
            .select(
                _ROW,
                F.transform(F.col("_jv"), lambda s: s["j"]).alias("indices"),
                F.transform(F.col("_jv"), lambda s: s["v"]).alias("values"),
            )
        )
        return SparseDsArray(rows, shape)

    def _binary_union(self, other: "SparseDsArray", coef: float) -> "SparseDsArray":
        if self._shape != other._shape:
            raise ValueError(f"shape mismatch: {self._shape} vs {other._shape}")
        cells = self._cells().unionAll(
            other._cells().select(
                _ROW, "j", (F.col("v") * F.lit(coef)).alias("v")
            )
        )
        summed = cells.groupBy(_ROW, "j").agg(F.sum("v").alias("v"))
        return self._from_cells(summed, self._shape)

    def __add__(self, other: "SparseDsArray") -> "SparseDsArray":
        """Sparse + sparse (union of supports; zeros stay implicit)."""
        return self._binary_union(other, 1.0)

    def __sub__(self, other: "SparseDsArray") -> "SparseDsArray":
        return self._binary_union(other, -1.0)

    def multiply(self, other: "SparseDsArray") -> "SparseDsArray":
        """Elementwise (Hadamard) product — support INTERSECTION, so
        the join keys on stored cells only (nnz-proportional)."""
        if self._shape != other._shape:
            raise ValueError(f"shape mismatch: {self._shape} vs {other._shape}")
        a = self._cells()
        b = other._cells().select(
            F.col(_ROW).alias("_rb"), F.col("j").alias("_jb"),
            F.col("v").alias("_vb"),
        )
        prod = a.join(
            b, (F.col(_ROW) == F.col("_rb")) & (F.col("j") == F.col("_jb"))
        ).select(_ROW, "j", (F.col("v") * F.col("_vb")).alias("v"))
        return self._from_cells(prod, self._shape)

    def transpose(self) -> "SparseDsArray":
        """CSR transpose: one nnz-proportional shuffle regrouping
        cells by column."""
        cells = self._cells().select(
            F.col("j").cast("long").alias(_ROW),
            F.col(_ROW).cast("int").alias("j"),
            "v",
        )
        return self._from_cells(cells, (self._shape[1], self._shape[0]))

    # -- matmul --------------------------------------------------------
    def matmul_sparse(self, other: "SparseDsArray") -> "SparseDsArray":
        """SpGEMM, relationally: A cells (i,k) ⋈ B cells (k,j) on the
        contraction index, hash-agg per (i,j) — the shuffle carries
        nnz(A)+nnz(B) cells in and one row per output nonzero out
        (the standard distributed sparse-matmul plan)."""
        if self._shape[1] != other._shape[0]:
            raise ValueError(
                f"shape mismatch for matmul: {self._shape} @ {other._shape}"
            )
        a = self._cells().select(
            F.col(_ROW).alias("i"), F.col("j").alias("k"), F.col("v").alias("va")
        )
        b = other._cells().select(
            F.col(_ROW).cast("int").alias("k_b"),
            F.col("j").alias("jj"),
            F.col("v").alias("vb"),
        )
        prod = (
            a.join(b, F.col("k") == F.col("k_b"))
            .groupBy("i", "jj")
            .agg(F.sum(F.col("va") * F.col("vb")).alias("v"))
            .select(
                F.col("i").alias(_ROW), F.col("jj").alias("j"), "v"
            )
        )
        return self._from_cells(prod, (self._shape[0], other._shape[1]))

    def matmul_dense(self, local: np.ndarray):
        """A @ M for a small driver-side dense M (d×m): M broadcast as
        an array-of-rows literal; each CSR row folds its stored
        (j, v) pairs into a dense m-vector — narrow map, no shuffle.
        Returns a DENSE DsArray (the one sparse op that densifies by
        nature: the output of sparse @ dense is dense)."""
        from dislib_spark.array.core import DsArray, _FEAT

        d, m = local.shape
        if self._shape[1] != d:
            raise ValueError(
                f"shape mismatch for matmul: {self._shape} @ {local.shape}"
            )
        m_rows = F.array(
            *[
                F.array(*[F.lit(float(local[i, j])) for j in range(m)])
                for i in range(d)
            ]
        )
        feat = F.aggregate(
            F.arrays_zip(F.col("indices"), F.col("values")),
            F.array_repeat(F.lit(0.0), m),
            lambda acc, iv: F.zip_with(
                acc,
                F.element_at(m_rows, iv["indices"] + 1),
                lambda x, w: x + iv["values"] * w,
            ),
        )
        df = self._df.select(_ROW, feat.alias(_FEAT))
        return DsArray(df, (self._shape[0], m))

    # -- reductions aware of implicit zeros ---------------------------
    def _extremum(self, agg_fn, axis: int):
        """min/max over a sparse axis-0 slice must include the
        IMPLICIT ZEROS of absent cells: a column with fewer stored
        cells than rows extends its candidate set with 0."""
        from dislib_spark.array.core import DsArray, _FEAT

        if axis != 0:
            raise NotImplementedError("sparse min/max: axis=0 only")
        n = self._shape[0]
        stats = self._cells().groupBy("j").agg(
            agg_fn(F.col("v")).alias("m"), F.count(F.lit(1)).alias("c")
        )
        rows = stats.collect()
        fill = 0.0
        vec = np.full(self._shape[1], fill)
        for r in rows:
            m = float(r["m"])
            vec[r["j"]] = m if r["c"] >= n else (
                max(m, fill) if agg_fn is F.max else min(m, fill)
            )
        spark = self._df.sparkSession
        df = spark.createDataFrame(
            [(0, vec.tolist())], f"{_ROW} long, {_FEAT} array<double>"
        )
        return DsArray(df, (1, self._shape[1]))

    def min(self, axis: int = 0):
        return self._extremum(F.min, axis)

    def max(self, axis: int = 0):
        return self._extremum(F.max, axis)

    def count_nonzero(self, axis: int = 0):
        from dislib_spark.array.core import DsArray, _FEAT

        if axis == 0:
            rows = self._cells().where(F.col("v") != 0.0).groupBy("j").agg(
                F.count(F.lit(1)).alias("c")
            ).collect()
            vec = np.zeros(self._shape[1])
            for r in rows:
                vec[r["j"]] = r["c"]
            spark = self._df.sparkSession
            df = spark.createDataFrame(
                [(0, vec.tolist())], f"{_ROW} long, {_FEAT} array<double>"
            )
            return DsArray(df, (1, self._shape[1]))
        df = self._df.select(
            _ROW,
            F.array(
                F.size(F.filter(F.col("values"), lambda v: v != 0.0))
                .cast("double")
            ).alias(_FEAT),
        )
        return DsArray(df, (self._shape[0], 1))

    def __getitem__(self, key):
        """Row slice (contiguous, step 1) — closed-form id shift, no
        re-indexing job."""
        if isinstance(key, slice):
            start, stop, step = key.indices(self._shape[0])
            if step != 1:
                raise NotImplementedError("sparse slicing: step 1 only")
            df = (
                self._df.where(
                    (F.col(_ROW) >= start) & (F.col(_ROW) < stop)
                )
                .select(
                    (F.col(_ROW) - F.lit(start)).alias(_ROW),
                    "indices",
                    "values",
                )
            )
            return SparseDsArray(df, (max(stop - start, 0), self._shape[1]))
        raise NotImplementedError("sparse indexing supports row slices")


def from_scipy_like(
    rows: list[tuple[int, list[int], list[float]]],
    shape: tuple[int, int],
    spark: SparkSession,
) -> SparseDsArray:
    """Build from (row_id, indices, values) triples."""
    df = spark.createDataFrame(
        rows, f"{_ROW} long, indices array<int>, values array<double>"
    )
    return SparseDsArray(df, shape)


def load_svmlight_sparse(
    spark: SparkSession, path: str, n_features: int
) -> tuple[SparseDsArray, "object"]:
    """store_sparse=True path of the reference's svmlight loader
    (data/io.py:15-75): native libsvm source, kept sparse."""
    from pyspark.ml.functions import vector_to_array  # noqa: F401
    import pandas as pd

    from dislib_spark.array.core import DsArray, _FEAT

    raw = spark.read.format("libsvm").option("numFeatures", n_features).load(path)

    def conv(batches):
        for pdf in batches:
            idxs, vals = [], []
            for v in pdf["features"]:
                # VectorUDT arrives as SparseVector or as its raw
                # struct dict {type,size,indices,values} via Arrow
                if hasattr(v, "indices"):
                    iv, vv = v.indices, v.values
                elif isinstance(v, dict) and v.get("indices") is not None:
                    iv, vv = v["indices"], v["values"]
                else:  # dense struct/vector: keep nonzeros
                    dense = v["values"] if isinstance(v, dict) else list(v)
                    iv = [i for i, x in enumerate(dense) if x != 0]
                    vv = [dense[i] for i in iv]
                idxs.append([int(i) for i in iv])
                vals.append([float(x) for x in vv])
            yield pd.DataFrame(
                {"indices": idxs, "values": vals, "label": pdf["label"]}
            )

    conv_df = raw.mapInPandas(
        conv, "indices array<int>, values array<double>, label double"
    )
    from dislib_spark.utils.base import with_global_index

    wide = with_global_index(conv_df, None, _ROW).select(
        _ROW, "indices", "values", F.col("label").alias("_y")
    ).cache()
    n = wide.count()
    x = SparseDsArray(wide.select(_ROW, "indices", "values"), (n, n_features))
    y = DsArray(
        wide.select(_ROW, F.array(F.col("_y")).alias(_FEAT)), (n, 1)
    )
    return x, y
