"""ComplexDsArray — complex-valued distributed 2-D arrays.

Reference: ``dislib/data/array.py:1219-1226`` (``Array.conj``) — the
reference ds-array accepts complex numpy blocks throughout, and
``conj`` is the one operator whose semantics *require* a complex
dtype. Spark SQL has no complex scalar type, so the Spark-first
design stores a complex matrix as a pair of real array columns
``(row_id BIGINT, re ARRAY<DOUBLE>, im ARRAY<DOUBLE>)`` and lowers
every complex operator to JVM higher-order functions over the two
parts:

- ``conj``            -> negate ``im`` (one narrow ``transform``)
- ``+`` / ``-``       -> part-wise ``zip_with`` (one ``row_id`` join)
- ``*`` (elementwise) -> (a+bi)(c+di) = (ac-bd) + (ad+bc)i, four
  ``zip_with`` folds inside one projection
- scalar complex ``*``-> two ``transform`` projections
- ``abs``             -> modulus sqrt(re^2+im^2) (real DsArray out)
- ``@`` (matmul)      -> Karatsuba-free 4-real-matmul lowering that
  reuses :func:`dislib_spark.array.linalg.matmul`'s shape-aware
  dispatch: Re = Ar@Br - Ai@Bi, Im = Ar@Bi + Ai@Br
- ``transpose``       -> the real transpose applied to each part

Everything stays JVM-side (no Python UDFs); a complex op costs at
most a constant factor (2-4x) over its real counterpart and inherits
the real operators' scale properties (narrow maps, join-on-row_id
only where co-location is genuinely needed).
"""

from __future__ import annotations

import numbers

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dislib_spark.array.core import _FEAT, _ROW, DsArray
from dislib_spark.array import linalg

_RE = "re"
_IM = "im"


def _complex_schema() -> T.StructType:
    arr = T.ArrayType(T.DoubleType(), False)
    return T.StructType(
        [
            T.StructField(_ROW, T.LongType(), False),
            T.StructField(_RE, arr, False),
            T.StructField(_IM, arr, False),
        ]
    )


class ComplexDsArray:
    """Distributed complex 2-D array = two co-partitioned real parts.

    The two parts live in ONE DataFrame, so part-wise operators are
    single projections (no join) and binary operators need exactly
    one ``row_id`` equi-join — identical shuffle behavior to the real
    :class:`DsArray`.
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

    def __repr__(self) -> str:
        return f"ComplexDsArray(shape={self._shape})"

    # -- views ---------------------------------------------------------
    @property
    def real(self) -> DsArray:
        """Real part as a real DsArray (zero-copy projection)."""
        return DsArray(
            self._df.select(_ROW, F.col(_RE).alias(_FEAT)), self._shape
        )

    @property
    def imag(self) -> DsArray:
        return DsArray(
            self._df.select(_ROW, F.col(_IM).alias(_FEAT)), self._shape
        )

    # -- the operator the reference needs complex for ------------------
    def conj(self) -> "ComplexDsArray":
        """Complex conjugate (reference array.py:1219-1226): negate
        the imaginary part. One narrow JVM ``transform`` — no shuffle,
        no Python."""
        df = self._df.select(
            _ROW,
            F.col(_RE),
            F.transform(F.col(_IM), lambda v: -v).alias(_IM),
        )
        return ComplexDsArray(df, self._shape)

    # -- arithmetic ----------------------------------------------------
    def _binary(self, other: "ComplexDsArray", re_fn, im_fn) -> "ComplexDsArray":
        if self._shape != other._shape:
            raise ValueError(f"shape mismatch {self._shape} vs {other._shape}")
        rhs = other._df.select(
            F.col(_ROW), F.col(_RE).alias("_rre"), F.col(_IM).alias("_rim")
        )
        df = self._df.join(rhs, _ROW).select(
            _ROW, re_fn().alias(_RE), im_fn().alias(_IM)
        )
        return ComplexDsArray(df, self._shape)

    def __add__(self, other):
        if isinstance(other, ComplexDsArray):
            return self._binary(
                other,
                lambda: F.zip_with(F.col(_RE), F.col("_rre"), lambda a, b: a + b),
                lambda: F.zip_with(F.col(_IM), F.col("_rim"), lambda a, b: a + b),
            )
        return self._scalar_add(complex(other))

    def __sub__(self, other):
        if isinstance(other, ComplexDsArray):
            return self._binary(
                other,
                lambda: F.zip_with(F.col(_RE), F.col("_rre"), lambda a, b: a - b),
                lambda: F.zip_with(F.col(_IM), F.col("_rim"), lambda a, b: a - b),
            )
        return self._scalar_add(-complex(other))

    def __mul__(self, other):
        if isinstance(other, ComplexDsArray):
            # (a+bi)(c+di) = (ac - bd) + (ad + bc)i
            return self._binary(
                other,
                lambda: F.zip_with(
                    F.zip_with(F.col(_RE), F.col("_rre"), lambda a, c: a * c),
                    F.zip_with(F.col(_IM), F.col("_rim"), lambda b, d: b * d),
                    lambda ac, bd: ac - bd,
                ),
                lambda: F.zip_with(
                    F.zip_with(F.col(_RE), F.col("_rim"), lambda a, d: a * d),
                    F.zip_with(F.col(_IM), F.col("_rre"), lambda b, c: b * c),
                    lambda ad, bc: ad + bc,
                ),
            )
        if isinstance(other, numbers.Number):
            z = complex(other)
            cr, ci = float(z.real), float(z.imag)
            df = self._df.select(
                _ROW,
                F.zip_with(
                    F.transform(F.col(_RE), lambda a: a * F.lit(cr)),
                    F.transform(F.col(_IM), lambda b: b * F.lit(ci)),
                    lambda x, y: x - y,
                ).alias(_RE),
                F.zip_with(
                    F.transform(F.col(_RE), lambda a: a * F.lit(ci)),
                    F.transform(F.col(_IM), lambda b: b * F.lit(cr)),
                    lambda x, y: x + y,
                ).alias(_IM),
            )
            return ComplexDsArray(df, self._shape)
        return NotImplemented

    __rmul__ = __mul__
    __radd__ = __add__

    def _scalar_add(self, z: complex) -> "ComplexDsArray":
        cr, ci = float(z.real), float(z.imag)
        df = self._df.select(
            _ROW,
            F.transform(F.col(_RE), lambda a: a + F.lit(cr)).alias(_RE),
            F.transform(F.col(_IM), lambda b: b + F.lit(ci)).alias(_IM),
        )
        return ComplexDsArray(df, self._shape)

    def __neg__(self):
        return self * -1.0

    def abs(self) -> DsArray:
        """Elementwise modulus |z| — a REAL DsArray."""
        df = self._df.select(
            _ROW,
            F.zip_with(
                F.col(_RE), F.col(_IM), lambda a, b: F.sqrt(a * a + b * b)
            ).alias(_FEAT),
        )
        return DsArray(df, self._shape)

    # -- linear algebra ------------------------------------------------
    def transpose(self) -> "ComplexDsArray":
        return from_parts(self.real.transpose(), self.imag.transpose())

    @property
    def T(self) -> "ComplexDsArray":
        return self.transpose()

    def hermitian(self) -> "ComplexDsArray":
        """Conjugate transpose A^H — the operator complex linear
        algebra actually composes ``conj`` into."""
        return self.conj().transpose()

    def __matmul__(self, other: "ComplexDsArray") -> "ComplexDsArray":
        """Complex matmul via four real matmuls, each routed through
        the shape-aware real dispatcher (gram / broadcast-local /
        BlockMatrix — see linalg.matmul). Cost = 4x real matmul; the
        3-multiplication Karatsuba form trades one multiply for three
        adds/joins, a loss on Spark where the join is the expensive
        step."""
        if not isinstance(other, ComplexDsArray):
            other = from_real(other)
        ar, ai = self.real, self.imag
        br, bi = other.real, other.imag
        re = linalg.matmul(ar, br) - linalg.matmul(ai, bi)
        im = linalg.matmul(ar, bi) + linalg.matmul(ai, br)
        return from_parts(re, im)

    # -- materialization ----------------------------------------------
    def collect(self) -> np.ndarray:
        rows = self._df.orderBy(_ROW).collect()
        out = np.empty(self._shape, dtype=np.complex128)
        for r in rows:
            out[r[_ROW]] = np.asarray(r[_RE]) + 1j * np.asarray(r[_IM])
        return out


def carray(
    x, spark: SparkSession | None = None, num_partitions: int | None = None
) -> ComplexDsArray:
    """Ingest an in-memory complex 2-D array (the complex analogue of
    :func:`dislib_spark.array.core.array`; reference arrays accept
    complex blocks natively, array.py:1219-1226)."""
    spark = spark or SparkSession.getActiveSession()
    x = np.asarray(x, dtype=np.complex128)
    if x.ndim != 2:
        raise ValueError("ComplexDsArray is 2-dimensional")
    rows = [
        (i, [float(v) for v in row.real], [float(v) for v in row.imag])
        for i, row in enumerate(x)
    ]
    df = spark.createDataFrame(rows, _complex_schema())
    if num_partitions:
        df = df.repartition(num_partitions)
    return ComplexDsArray(df, x.shape)


def from_parts(re: DsArray, im: DsArray) -> ComplexDsArray:
    """Build a complex array from two real DsArrays (one row_id join)."""
    if re.shape != im.shape:
        raise ValueError(f"shape mismatch {re.shape} vs {im.shape}")
    rdf = re.df.select(_ROW, F.col(_FEAT).alias(_RE))
    idf = im.df.select(_ROW, F.col(_FEAT).alias(_IM))
    return ComplexDsArray(rdf.join(idf, _ROW), re.shape)


def from_real(re: DsArray) -> ComplexDsArray:
    """Lift a real DsArray to complex with zero imaginary part (no
    join — the zero part is synthesized in the same projection)."""
    df = re.df.select(
        _ROW,
        F.col(_FEAT).alias(_RE),
        F.transform(F.col(_FEAT), lambda _: F.lit(0.0)).alias(_IM),
    )
    return ComplexDsArray(df, re.shape)
