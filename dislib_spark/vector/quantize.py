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
    # one parsed SQL expression per array: the 2×dim Column-API agg
    # list cost ~1.5 s of py4j round-trips per plan build at dim=64;
    # the parsed tree (min/max over col[i] cast double) is identical
    mins = "array(" + ",".join(
        f"min(CAST({col}[{i}] AS DOUBLE))" for i in range(dim)
    ) + ")"
    maxs = "array(" + ",".join(
        f"max(CAST({col}[{i}] AS DOUBLE))" for i in range(dim)
    ) + ")"
    return df.agg(
        F.expr(mins).alias("mins"), F.expr(maxs).alias("maxs")
    )


def sq8_encode(df: DataFrame, col: str, dim: int) -> DataFrame:
    """Adds a ``codes`` array<int> column (0..255 per dimension) from
    a broadcast ``sq8_stats`` pass; constant dimensions map to 0."""
    return sq8_encode_with_stats(df, col, sq8_stats(df, col, dim))


def sq8_encode_with_stats(
    df: DataFrame, col: str, stats: DataFrame
) -> DataFrame:
    """:func:`sq8_encode` against a GIVEN 1-row ``mins``/``maxs``
    stats frame — the append/maintenance form: the grid is part of
    the stored index's FORMAT (fixed at build, like an IVF coarse
    quantizer), so new batches encode against the stored grid, never
    a re-derived one (re-deriving would silently shift every stored
    code's meaning). Values outside the build-time grid clamp to the
    0/255 edge codes."""
    emb = F.col(col).cast("array<double>")

    def code(x: Column, i: Column) -> Column:
        mn = F.element_at("mins", i + F.lit(1))
        mx = F.element_at("maxs", i + F.lit(1))
        q = F.floor((x - mn) * F.lit(255.0) / (mx - mn) + F.lit(0.5))
        clamped = F.least(F.greatest(q, F.lit(0.0)), F.lit(255.0))
        return F.when(mx == mn, F.lit(0)).otherwise(clamped).cast("int")

    return df.crossJoin(F.broadcast(stats)).withColumn(
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


def binary_quantize(
    df: DataFrame, col: str, dim: int, out_col: str = "bits"
) -> DataFrame:
    """Adds ``out_col``: the sign bits of ``col`` packed into
    ``ceil(dim/32)`` longs (bit j of word w set ⇔ element 32w+j > 0)
    — 32× compression (float32 → 1 bit), the coarsest standard
    embedding-index quantization. 32-bit words keep every value a
    small positive BIGINT (no sign-bit wraparound to reason about on
    any engine). Pure integer arithmetic map-side; zero shuffles."""
    n_words = (dim + 31) // 32

    def word(w: int) -> Column:
        lo = 32 * w
        width = min(32, dim - lo)
        return F.expr(
            f"aggregate(sequence(0, {width - 1}), CAST(0 AS BIGINT), "
            f"(acc, j) -> acc + IF(element_at({col}, {lo} + j + 1) > 0, "
            f"CAST(POW(2, j) AS BIGINT), CAST(0 AS BIGINT)))"
        )

    return df.withColumn(
        out_col, F.array(*[word(w) for w in range(n_words)])
    )


def hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by Hamming distance between sign-bit codes:
    both sides pack to words map-side, the (small) query set
    broadcasts against the corpus scan, distance is
    ``Σ bit_count(xor(word pairs))`` — pure 64-bit integer ops in
    codegen, ~dim/64 instructions per pair vs dim multiply-adds for
    cosine. Rank per query with a partitioned window, ties by c_id.

    The standard first-stage filter at 100 TB: scan the 1-bit codes,
    then exact-rerank the survivors with ``cosine_topk``."""
    n_words = (dim + 31) // 32
    q = binary_quantize(queries, vec_col, dim).select(
        F.col(id_col).alias("q_id"), F.col("bits").alias("q_bits")
    )
    c = binary_quantize(corpus, vec_col, dim).select(
        F.col(id_col).alias("c_id"), F.col("bits").alias("c_bits")
    )
    dist = sum(
        (
            F.bit_count(
                F.element_at("q_bits", w + 1).bitwiseXOR(
                    F.element_at("c_bits", w + 1)
                )
            )
            for w in range(n_words)
        ),
        F.lit(0),
    )
    from pyspark.sql.window import Window

    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .select("q_id", "c_id", dist.cast("int").alias("hamming"))
    )
    w = Window.partitionBy("q_id").orderBy("hamming", "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "hamming", "rank")
    )
