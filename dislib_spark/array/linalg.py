"""Distributed linear algebra for DsArray.

Reference: dislib matmul (``dislib/data/array.py:92-122, 1650-1736``),
transpose (``array.py:1047-1098``), kron (``dislib/math/base.py:15-93``).

Spark-first design: two matmul strategies ——

1. ``matmul`` (default): MLlib ``BlockMatrix.multiply`` — the JVM
   block-partitioned algorithm (grid shuffle, per-block GEMM). This is
   the same blocked-outer-product plan dislib hand-schedules
   (``_multiply_block_groups`` array.py:1784-1809), but executed by
   Spark's shuffle machinery.
2. ``matmul_sql``: the relational form (explode → equi-join on the
   contraction index → hash agg). Checkable against a SQL oracle, and
   preferable when one side is small enough to broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW


def _df_to_irm(arr: DsArray):
    """DsArray → IndexedRowMatrix with the data staying JVM-side:
    array→vector conversion and the IndexedRow wrapping both run as
    JVM expressions (array_to_vector + convertVectorColumnsFromML +
    the DataFrame-accepting IndexedRowMatrix constructor). The
    round-1 ``df.rdd.map(lambda …)`` pickled every row through a
    Python worker in both directions — the matmul bottleneck at
    scale."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.mllib.linalg.distributed import IndexedRowMatrix
    from pyspark.mllib.util import MLUtils

    df = arr.df.select(
        F.col(_ROW).cast("long").alias("index"),
        array_to_vector(F.col(_FEAT).cast("array<double>")).alias("vector"),
    )
    df = MLUtils.convertVectorColumnsFromML(df, "vector")
    return IndexedRowMatrix(df, numRows=arr.shape[0], numCols=arr.shape[1])


def _irm_to_df(irm, spark, shape: tuple[int, int]) -> DsArray:
    """IndexedRowMatrix → DsArray, JVM-side: getIndexedRows hands back
    a (index, vector) DataFrame directly (we deliberately skip the
    pyspark ``rows`` property, whose .rdd.map would pull every row
    through Python); vector_to_array accepts mllib vectors."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.mllib.common import callMLlibFunc

    rows_df = callMLlibFunc(
        "getIndexedRows", irm._java_matrix_wrapper._java_model
    )
    df = rows_df.select(
        F.col("index").alias(_ROW),
        vector_to_array(F.col("vector")).alias(_FEAT),
    )
    return DsArray(df, shape)


def _to_block_matrix(arr: DsArray, rows_per_block: int = 1024):
    return _df_to_irm(arr).toBlockMatrix(
        rowsPerBlock=rows_per_block, colsPerBlock=rows_per_block
    )


def _from_block_matrix(bm, spark, shape: tuple[int, int]) -> DsArray:
    return _irm_to_df(bm.toIndexedRowMatrix(), spark, shape)


def _gram_matmul(a: DsArray, b: DsArray) -> DsArray:
    """AᵀB for row-aligned tall matrices via one Arrow pass: per-batch
    numpy GEMM partials packed into a single array column, merged by
    posexplode + idx-grouped sum (the PCA/OLS packed-partial pattern —
    reference _partial_scatter pca/base.py:316-372). No shuffle of
    row data; only k·m doubles per batch cross the wire.

    mapInArrow, not mapInPandas: the pandas bridge materializes one
    Python ndarray object PER ROW for array columns (measured 26 s on
    1M×20); reading the ListArray's flat value buffer is zero-copy
    (~3 s)."""
    n, k = a.shape
    m = b.shape[1]
    if a.df is b.df:
        src = a.df.select(F.col(_FEAT).alias("_fa"), F.col(_FEAT).alias("_fb"))
    else:
        src = a.df.select(_ROW, F.col(_FEAT).alias("_fa")).join(
            b.df.select(_ROW, F.col(_FEAT).alias("_fb")), _ROW
        )

    def partials(batches):
        import pyarrow as pa

        for batch in batches:
            nrows = batch.num_rows
            if nrows == 0:
                continue
            # flatten() honors list offsets; rows are fixed-length
            A = np.asarray(batch.column(0).flatten(), dtype=np.float64)
            B = np.asarray(batch.column(1).flatten(), dtype=np.float64)
            out = A.reshape(nrows, -1).T @ B.reshape(nrows, -1)
            yield pa.RecordBatch.from_arrays(
                [pa.array([out.ravel().tolist()], type=pa.list_(pa.float64()))],
                ["partial"],
            )

    rows = (
        src.select("_fa", "_fb")
        .mapInArrow(partials, "partial array<double>")
        .select(F.posexplode("partial").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    out = np.zeros(k * m)
    for r in rows:
        out[r["idx"]] = r["s"]
    from dislib_spark.array.core import array as _mk

    return _mk(out.reshape(k, m), a.spark)


def matmul(
    a: DsArray,
    b: DsArray,
    transpose_a: bool = False,
    transpose_b: bool = False,
    strategy: str = "auto",
) -> DsArray:
    """A @ B (reference matmul array.py:1650-1730), strategy by shape:

    - ``AᵀB`` with a small k×m result → one-pass packed-partial
      aggregation (``_gram_matmul``) — the Gramian case; BlockMatrix
      here wastes two full shuffles building block grids.
    - small right operand → collect + broadcast (``_matmul_local``,
      narrow map, no shuffle).
    - genuinely large × large → MLlib BlockMatrix (grid shuffle +
      per-block GEMM), data staying JVM-side end to end.

    ``strategy='blocks'`` forces BlockMatrix (for tests/benchmarks).
    """
    sa = (a.shape[1], a.shape[0]) if transpose_a else a.shape
    sb = (b.shape[1], b.shape[0]) if transpose_b else b.shape
    if sa[1] != sb[0]:
        raise ValueError(f"shape mismatch for matmul: {sa} @ {sb}")
    if strategy == "auto":
        if (
            transpose_a
            and not transpose_b
            and a.shape[0] == b.shape[0]
            and sa[0] * sb[1] <= 4_000_000
        ):
            return _gram_matmul(a, b)
        if not transpose_a and sb[0] * sb[1] <= 1_000_000:
            local = b.collect()
            if transpose_b:
                local = local.T
            return _matmul_local(a, np.asarray(local, dtype=np.float64))
    bm_a = _to_block_matrix(a)
    bm_b = _to_block_matrix(b)
    if transpose_a:
        bm_a = bm_a.transpose()
    if transpose_b:
        bm_b = bm_b.transpose()
    res = bm_a.multiply(bm_b)
    return _from_block_matrix(res, a.spark, (sa[0], sb[1]))


def matmul_sql(a: DsArray, b: DsArray) -> DsArray:
    """Relational matmul: SELECT a.i, b.j, SUM(a.v*b.v) ... GROUP BY
    (SURVEY.md §2.3). Broadcast-joins when B is small."""
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"shape mismatch for matmul: {a.shape} @ {b.shape}")
    cells_a = a.df.select(
        F.col(_ROW).alias("i"), F.posexplode(_FEAT).alias("k", "av")
    )
    cells_b = b.df.select(
        F.col(_ROW).alias("k_row"), F.posexplode(_FEAT).alias("j", "bv")
    )
    if b.shape[0] * b.shape[1] <= 1_000_000:
        cells_b = F.broadcast(cells_b)
    prod = (
        cells_a.join(cells_b, cells_a.k == cells_b.k_row)
        .groupBy("i", "j")
        .agg(F.sum(F.col("av") * F.col("bv")).alias("v"))
    )
    rows = prod.groupBy("i").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "v"))), lambda s: s["v"]
        ).alias(_FEAT)
    )
    df = rows.select(F.col("i").alias(_ROW), _FEAT)
    return DsArray(df, (a.shape[0], b.shape[1]))


def transpose(arr: DsArray) -> DsArray:
    """Blockwise transpose (reference array.py:1047-1098) as the
    relational pivot: explode to cells, regroup by column index.
    One shuffle of n·d cells — inherent to transposition."""
    cells = arr.df.select(F.col(_ROW).alias("i"), F.posexplode(_FEAT).alias("j", "v"))
    rows = cells.groupBy("j").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "v"))), lambda s: s["v"]
        ).alias(_FEAT)
    )
    df = rows.select(F.col("j").cast("long").alias(_ROW), _FEAT)
    return DsArray(df, (arr.shape[1], arr.shape[0]))


def kron(a: DsArray, b: DsArray) -> DsArray:
    """Kronecker product (reference math/base.py:15-93) via crossJoin
    of cell tables — Catalyst handles it as a cartesian with the small
    side broadcast."""
    n, m = a.shape
    p, q = b.shape
    ca = a.df.select(F.col(_ROW).alias("i"), F.posexplode(_FEAT).alias("j", "av"))
    cb = b.df.select(F.col(_ROW).alias("k"), F.posexplode(_FEAT).alias("l", "bv"))
    if p * q <= 1_000_000:
        cb = F.broadcast(cb)
    cells = ca.crossJoin(cb).select(
        (F.col("i") * p + F.col("k")).alias("out_i"),
        (F.col("j") * q + F.col("l")).alias("out_j"),
        (F.col("av") * F.col("bv")).alias("v"),
    )
    rows = cells.groupBy("out_i").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("out_j", "v"))), lambda s: s["v"]
        ).alias(_FEAT)
    )
    df = rows.select(F.col("out_i").cast("long").alias(_ROW), _FEAT)
    return DsArray(df, (n * p, m * q))


def svd(arr: DsArray, k: int | None = None):
    """SVD via RowMatrix.computeSVD (ARPACK Lanczos — covers the
    reference's block-Jacobi ``math/base.py:95-216``, lanczos
    ``decomposition/lanczos/base.py``, and random SVD
    ``decomposition/randomsvd/base.py`` semantics).

    Returns (U: DsArray, S: np.ndarray, V: np.ndarray).
    """
    n, d = arr.shape
    k = k or min(n, d)
    svd_model = _df_to_irm(arr).computeSVD(k, computeU=True)
    u = _irm_to_df(svd_model.U, arr.spark, (n, k))
    s = np.array(svd_model.s.toArray())
    v = np.array(svd_model.V.toArray())
    return u, s, v


def qr_economic(arr: DsArray):
    """Economic QR via RowMatrix.tallSkinnyQR — the communication-
    avoiding TSQR the reference implements by hand
    (``decomposition/tsqr/base.py:11-740``; QR family
    ``decomposition/qr/base.py``).

    Returns (Q: DsArray (n×d), R: np.ndarray (d×d)).
    """
    n, d = arr.shape
    qr = _df_to_irm(arr).toRowMatrix().tallSkinnyQR(computeQ=True)
    # tallSkinnyQR drops row indices; re-key Q by zipWithIndex order is
    # not stable, so recompute Q = A @ R^{-1} keyed by original row_id.
    r = np.array(qr.R.toArray())
    r_inv = np.linalg.inv(r)
    q = _matmul_local(arr, r_inv)
    return q, r


def _matmul_local(arr: DsArray, local: np.ndarray) -> DsArray:
    """A @ M for a small driver-side matrix M: M broadcast as an
    array-of-columns literal, one zip_with dot product per output
    column — narrow map, no shuffle, and expression size O(in+out)
    (expanded sum chains are O(in·out) codegen — measured quadratic
    blowup at d=64)."""
    m_cols = F.array(
        *[
            F.array(*[F.lit(float(local[i, j])) for i in range(local.shape[0])])
            for j in range(local.shape[1])
        ]
    )
    feat = F.transform(
        m_cols,
        lambda mcol: F.aggregate(
            F.zip_with(F.col(_FEAT), mcol, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    df = arr.df.select(_ROW, feat.alias(_FEAT))
    return DsArray(df, (arr.shape[0], local.shape[1]))


def qr_full(arr: DsArray, indexes: list[int] | None = None):
    """Full QR: A (n×d) = Q (n×n, orthogonal) · R (n×d, upper
    triangular). Reference contract: ``decomposition/qr/base.py``
    mode='full' and ``decomposition/tsqr/base.py`` mode='complete'
    (their tests assert QᵀQ=I, triu(R)=R, Q·R=A — pinned here by
    tests/test_model_tensor_qr.py).

    One-level TSQR with null-space completion, two distributed passes:

    1. Per row-block (``applyInPandas`` over ``row_id DIV b``): local
       reduced QR → R_p (k_p×d, k_p=min(m_p,d)). Only the stacked
       R_p's (K×d, K=Σk_p ≤ L·d — L row blocks) reach the driver,
       where one small COMPLETE QR gives Qs (K×K) and the global
       R = [Rs; 0].
    2. Same grouping again: local COMPLETE QR → Q_p (m_p×m_p);
       leaf p's n output columns are
       ``[Q_p[:,:k_p] @ Qs[rows_p] | Q_p[:,k_p:] at own offset]`` —
       the identity columns of rows the leaf's R didn't touch pass
       through untouched (block-diagonal ⊕ structure), so each leaf
       writes exactly its m_p rows. Local QRs are LAPACK-deterministic,
       so pass 2 reproduces pass 1's R_p bit-for-bit.

    ``indexes`` (reference tsqr ``indexes=`` param) selects Q COLUMNS:
    the per-leaf compute then builds only m_p×|indexes| values — at
    scale this sidesteps the n² output entirely. Full-Q itself is
    inherently O(n²) output; use it for moderate n (or pass indexes),
    exactly like the reference, whose complete modes materialize the
    same n×n factor.

    Returns (Q: DsArray (n×n) — or (n×|indexes|), R: np.ndarray (n×d)).
    """
    import pandas as pd

    n, d = arr.shape
    spark = arr.spark
    par = spark.sparkContext.defaultParallelism
    b = max(d, -(-n // max(1, par)))  # block size ≥ d, ~n/parallelism
    leaf_count = -(-n // b)
    leaf = (F.col(_ROW) / F.lit(b)).cast("long").alias("_leaf")

    src = arr.df.select(leaf, _ROW, _FEAT)

    def _phase1(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("row_id")
        A = np.vstack(pdf["features"].to_numpy())
        r = np.linalg.qr(A, mode="r")
        k = min(A.shape[0], d)
        return pd.DataFrame(
            {
                "_leaf": [int(pdf["_leaf"].iloc[0])],
                "m": [A.shape[0]],
                "r_flat": [r[:k].reshape(-1).tolist()],
            }
        )

    parts = (
        src.groupBy("_leaf")
        .applyInPandas(
            _phase1, schema="_leaf long, m long, r_flat array<double>"
        )
        .collect()
    )
    parts.sort(key=lambda row: row["_leaf"])
    r_blocks, row_offs, id_offs, sizes = [], {}, {}, {}
    K = 0
    id_off = 0
    for row in parts:
        m_p = int(row["m"])
        k_p = min(m_p, d)
        row_offs[row["_leaf"]] = K
        id_offs[row["_leaf"]] = id_off
        sizes[row["_leaf"]] = m_p
        r_blocks.append(
            np.array(row["r_flat"], dtype=np.float64).reshape(k_p, d)
        )
        K += k_p
        id_off += m_p - k_p
    S = np.vstack(r_blocks) if r_blocks else np.zeros((0, d))
    Qs, Rs = np.linalg.qr(S, mode="complete")
    R_full = np.zeros((n, d))
    R_full[:K] = Rs
    n_out = n if indexes is None else len(indexes)
    idx = None if indexes is None else [int(i) for i in indexes]
    if idx is not None and not idx:
        # R-only callers (tsqr mode='r_complete'): skip the Q pass
        return None, R_full

    r1_by_leaf = {
        int(row["_leaf"]): blk for row, blk in zip(parts, r_blocks)
    }
    bc = spark.sparkContext.broadcast(
        (Qs, row_offs, id_offs, sizes, K, idx, r1_by_leaf)
    )

    def _phase2(pdf: pd.DataFrame) -> pd.DataFrame:
        Qs_b, row_offs_b, id_offs_b, sizes_b, K_b, idx_b, r1_b = bc.value
        pdf = pdf.sort_values("row_id")
        p = int(pdf["_leaf"].iloc[0])
        A = np.vstack(pdf["features"].to_numpy())
        m_p = A.shape[0]
        k_p = min(m_p, d)
        Qp, Rp2 = np.linalg.qr(A, mode="complete")
        # pass 2 assumes this refactorization reproduces pass 1's R_p
        # (true for deterministic LAPACK on one machine, NOT
        # guaranteed with heterogeneous/threaded BLAS across
        # executors) — verify the cheap k_p×d block and fail loudly
        # instead of returning a silently wrong Q
        if not np.allclose(Rp2[:k_p], r1_b[p], rtol=1e-10, atol=1e-12):
            raise RuntimeError(
                f"qr_full: pass-2 local QR of leaf {p} diverged from "
                "pass-1's R block (non-deterministic BLAS across "
                "executors?) — Q·R=A would silently break"
            )
        ro, io = row_offs_b[p], id_offs_b[p]
        if idx_b is None:
            out = np.zeros((m_p, n))
            out[:, :K_b] = Qp[:, :k_p] @ Qs_b[ro : ro + k_p, :]
            out[:, K_b + io : K_b + io + (m_p - k_p)] = Qp[:, k_p:]
        else:
            out = np.zeros((m_p, len(idx_b)))
            for j, c in enumerate(idx_b):
                if c < K_b:
                    out[:, j] = Qp[:, :k_p] @ Qs_b[ro : ro + k_p, c]
                elif io <= c - K_b < io + (m_p - k_p):
                    out[:, j] = Qp[:, k_p + (c - K_b - io)]
        return pd.DataFrame(
            {
                "row_id": pdf["row_id"].to_numpy(),
                "features": list(out),
            }
        )

    qdf = src.groupBy("_leaf").applyInPandas(
        _phase2, schema=f"{_ROW} long, {_FEAT} array<double>"
    )
    return DsArray(qdf, (n, n_out)), R_full
