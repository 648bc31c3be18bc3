"""Scalar (int8) quantization for embedding columns.

The compression step every large ANN index applies before the
structures in ``vector.search`` (IVF/PQ/LSH): per-dimension min/max
over the corpus, each value mapped to an 8-bit level, reconstruction
``mn + q·(mx-mn)/255``. SQ8 cuts vector storage 4× (float32 → uint8)
with near-lossless recall, and the reconstruction-error report here
is the acceptance gate a pipeline runs before swapping the index to
quantized codes.

Extension surface (no reference counterpart — dislib has no vector
layer).

Scale design:
- ``sq8_stats`` is ONE aggregation pass producing two fixed-width
  arrays (2·dim scalar min/max expressions — JVM-side, codegen'd, no
  explode: the exploded form shuffles n·dim rows for what is a
  128-number result).
- ``sq8_error_stats`` broadcasts that 1-row stats frame and computes
  codes + errors map-side with array HOFs — zero extra shuffles
  beyond the final tiny groupBy on ``by``.

Determinism: quantize/reconstruct is pure double IEEE arithmetic
(identical bits on any engine); per-dimension squared errors are cast
to DECIMAL(28,15) and summed exactly, so per-vector and per-group
errors are summation-order-independent — the DuckDB oracle replays
them bit-for-bit (v14).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sq8_stats(df: DataFrame, col: str, dim: int) -> DataFrame:
    """1-row frame with ``mins``/``maxs`` array<double> columns: the
    per-dimension corpus bounds that define the SQ8 grid."""
    v = lambda i: F.col(col)[i].cast("double")  # noqa: E731
    return df.agg(
        F.array(*[F.min(v(i)) for i in range(dim)]).alias("mins"),
        F.array(*[F.max(v(i)) for i in range(dim)]).alias("maxs"),
    )


def sq8_encode(df: DataFrame, col: str, dim: int) -> DataFrame:
    """Adds a ``codes`` array<int> column (0..255 per dimension) from
    a broadcast ``sq8_stats`` pass; constant dimensions map to 0."""
    stats = F.broadcast(sq8_stats(df, col, dim))
    emb = F.col(col).cast("array<double>")

    def code(x: Column, i: Column) -> Column:
        mn = F.element_at("mins", i + F.lit(1))
        mx = F.element_at("maxs", i + F.lit(1))
        q = F.floor((x - mn) * F.lit(255.0) / (mx - mn) + F.lit(0.5))
        return F.when(mx == mn, F.lit(0)).otherwise(q).cast("int")

    return df.crossJoin(stats).withColumn(
        "codes", F.transform(emb, code)
    ).drop("mins", "maxs")


def sq8_error_stats(
    df: DataFrame, col: str, dim: int, by: str
) -> DataFrame:
    """Per-``by``-group SQ8 reconstruction report: vector count, mean
    squared error per element and the worst per-vector squared error
    — all exact-decimal sums surfaced as rounded doubles."""
    stats = F.broadcast(sq8_stats(df, col, dim))
    emb = F.col(col).cast("array<double>")

    def term(x: Column, i: Column) -> Column:
        mn = F.element_at("mins", i + F.lit(1))
        mx = F.element_at("maxs", i + F.lit(1))
        q = F.floor((x - mn) * F.lit(255.0) / (mx - mn) + F.lit(0.5))
        recon = mn + q.cast("double") * (mx - mn) / F.lit(255.0)
        return (
            F.when(mx == mn, F.lit(0.0))
            .otherwise((x - recon) * (x - recon))
            .cast("decimal(28,15)")
        )

    err = F.aggregate(
        F.transform(emb, term),
        F.lit(0).cast("decimal(28,15)"),
        lambda a, t: (a + t).cast("decimal(28,15)"),
    )
    per_vec = df.crossJoin(stats).select(
        F.col(by), err.alias("err")
    )
    return (
        per_vec.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum("err").cast("double")
                / (F.count(F.lit(1)) * F.lit(dim)),
                6,
            ).alias("mse"),
            F.round(F.max("err").cast("double"), 6).alias("max_err"),
        )
        .orderBy(by)
    )
