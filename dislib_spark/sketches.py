"""Mergeable sketches for approximate analytics at 100 TB: HLL
distinct counting (Apache DataSketches via Spark built-ins),
count-min frequency, and approximate quantiles.

The scale story is MERGEABILITY, not just approximation: a partial
sketch per day/shard is a few KB of binary state that can be stored
in a parquet column and unioned later — distinct-users-over-any-
date-range becomes a metadata-sized merge instead of a re-scan of
raw events. ``sketch(union(partials)) == sketch(whole)`` exactly, so
incremental pipelines lose nothing vs a full recompute.

All operators are single-pass JVM aggregations (DataSketches runs
inside the JVM, no Python). N/A in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) per group (±~1.6% at
    lg_k=12) in one pass with fixed memory per group — the exact
    version's hash set is O(cardinality) per group and OOMs on
    high-cardinality keys at scale."""
    agg = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k))
    ).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_partial(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Binary HLL sketch per group — store this in a parquet column
    as incremental state (a few KB per group regardless of input
    size)."""
    agg = F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_merge_estimate(
    partials: DataFrame,
    sketch_col: str = "sketch",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union previously-stored partial sketches and estimate — the
    re-aggregation step of an incremental distinct-count pipeline
    (e.g. daily partials → monthly distinct users)."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))
    ).alias("approx_distinct")
    if group_cols:
        return partials.groupBy(*group_cols).agg(agg)
    return partials.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    group_cols: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate percentiles with bounded memory (KLL-style
    summary) — the scale path for ``x05``-type exact percentiles,
    whose per-group full sort is memory-proportional to group size."""
    agg = F.approx_percentile(
        F.col(col),
        F.array(*[F.lit(p) for p in probabilities]),
        F.lit(accuracy),
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def frequent_hitters(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
) -> DataFrame:
    """Heavy hitters above ``min_share`` of rows via a two-pass
    filter: a count-min sketch pass would give one-pass estimates,
    but for exact shares the partial-agg groupBy below is already
    map-side combined, so the shuffle carries one row per DISTINCT
    value — acceptable whenever the value domain is bounded. Returns
    (value, cnt, share)."""
    total = df.count()
    floor = int(total * min_share)
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.greatest(F.lit(1), F.lit(floor)))
        .withColumn("share", F.round(F.col("cnt") / total, 6))
    )


def count_min(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
) -> Column:
    """One-pass count-min sketch of a column (binary, mergeable) —
    point-frequency estimates without a groupBy shuffle. Returned as
    an aggregated binary column; pair with Spark's CountMinSketch
    reader on the consumer side."""
    return df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )
