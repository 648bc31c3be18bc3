"""Skew mitigation helpers.

At 100 TB, a handful of hot keys dominate groupBy/join shuffles. AQE
(`skewJoin.enabled`, on in our session) splits skewed JOIN partitions
automatically; these helpers cover the aggregation side and the
explicit-salt pattern for non-AQE deployments (SURVEY.md 'Optimize
for scale' — salting for skew).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Stage 1 groups on (keys + salt) — hot keys
    split across n_salts reducers; stage 2 merges the partials on the
    real keys (n_salts rows per key, trivially small).

    avg is deliberately absent: express it as sum/count and divide
    after the merge (partial avgs don't compose).
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {
        "sum": F.sum,
        "count": lambda c: F.count(F.lit(1)),
        "min": F.min,
        "max": F.max,
    }
    for out, (col, fn) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"unsupported agg fn {fn} for {out}")

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[fn](col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed-fact ⋈ small-dim with explicit salting: the fact side
    gets a random salt, the dim side is exploded n_salts× — hot keys
    spread over n_salts reducers. Prefer ``F.broadcast(small)`` when
    the dim fits in memory; this is the fallback when it doesn't but
    is still much smaller than the fact table."""
    fact = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    dim = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return fact.join(dim, [key, "_salt"]).drop("_salt")


def skew_profile(
    df: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    top: int = 5,
) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle key: distinct
    keys, heaviest-key share, top-``top`` concentration, and the
    max/mean imbalance ratio — the numbers that decide between a
    plain shuffle, AQE skew-split, and a salted join
    (``salted_agg``/``salted_join`` above).

    Cost: one map-side-combined key count (the same exchange the real
    aggregation would run), then top-k + three scalars over the
    key-count table. The top-k is ``orderBy().limit(top)`` —
    TakeOrderedAndProject (per-partition heap + top-row merge), never
    a global row_number Window: a high-cardinality key column would
    otherwise funnel its whole count table through one partition —
    the exact skew this utility exists to detect. Safe to run inline
    before a big job. Returns
    (n_rows, n_keys, max_share, topk_share, imbalance).
    """
    kc = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    totals = kc.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").alias("_max_n"),
        F.avg("n").alias("_avg_n"),
    )
    top_sum = F.broadcast(
        kc.orderBy(F.desc("n"), *key_cols)
        .limit(top)
        .agg(F.sum("n").alias("_top_n"))
    )
    return totals.crossJoin(top_sum).select(
        "n_rows",
        "n_keys",
        F.round(F.col("_max_n") / F.col("n_rows"), 6).alias("max_share"),
        F.round(F.col("_top_n") / F.col("n_rows"), 6).alias("topk_share"),
        F.round(F.col("_max_n") / F.col("_avg_n"), 6).alias("imbalance"),
    )
