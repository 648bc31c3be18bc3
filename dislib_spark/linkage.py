"""Blocked entity resolution (record linkage) for structured tables.

The multi-field cousin of ``text.dedup``: candidate pairs come from
equality on cheap BLOCKING keys (never a corpus self-join), then each
pair is scored by a weighted combination of per-field similarities —
the Fellegi-Sunter-style pipeline (Splink, dedupe) for "are these two
customer/supplier/product records the same entity?".

Extension surface (no reference counterpart — dislib has no
relational layer).

Scale design: the pair join is an equi-join on the blocking key —
shuffled hash join, output linear in Σ block². Block-size skew is the
lever (same shape as every dedup bucket cap here): pick blocking
columns so blocks stay small, or pass ``max_block`` to truncate each
block to its smallest ids deterministically. All similarity math is
JVM expressions (levenshtein, abs, greatest) — exact-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def string_similarity(a: Column, b: Column) -> Column:
    """1 − levenshtein/max_len in [0, 1] (1 = identical); exact
    integer edit distance over a double division — bit-identical on
    any engine."""
    return F.lit(1.0) - F.levenshtein(a, b) / F.greatest(
        F.length(a), F.length(b)
    ).cast("double")


def numeric_similarity(a: Column, b: Column, scale: float) -> Column:
    """1 − min(|a−b|/scale, 1) in [0, 1]; ``scale`` is the difference
    treated as total dissimilarity."""
    return F.lit(1.0) - F.least(
        F.abs(a - b) / F.lit(float(scale)), F.lit(1.0)
    )


def entity_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    scores: dict[str, Column],
    weights: dict[str, float],
    threshold: float = 0.0,
    max_block: int | None = None,
) -> DataFrame:
    """Candidate pairs within blocks, scored
    ``Σ w_f · sim_f / Σ w_f``. ``scores`` maps field name → a
    similarity Column built from ``F.col("a_<field>")`` /
    ``F.col("b_<field>")`` (both sides' payload columns are prefixed).
    Returns (a_id, b_id, per-field sims, score) for score ≥
    ``threshold``, a_id < b_id.

    ``max_block`` deterministically keeps each block's smallest ids
    (the whale-block cap — identical shape to
    ``text.dedup.minhash_lsh_pairs``' bucket cap)."""
    payload = [c for c in df.columns if c != id_col]
    side = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in payload],
    )
    if max_block is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*block_cols).orderBy("_id")
        side = (
            side.withColumn("_bn", F.row_number().over(w))
            .where(F.col("_bn") <= max_block)
            .drop("_bn")
        )
    a = side.select(
        F.col("_id").alias("a_id"),
        *[F.col(c).alias(f"a_{c}") for c in payload],
    )
    b = side.select(
        F.col("_id").alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in payload],
    )
    cond = F.col("a_id") < F.col("b_id")
    for c in block_cols:
        cond = cond & (F.col(f"a_{c}") == F.col(f"b_{c}"))
    pairs = a.join(b, cond)
    # score over the WEIGHTED fields in weights' insertion order (a
    # score without a weight is a display-only similarity column)
    total_w = sum(weights.values())
    score = sum(
        (
            F.round(scores[f], 9) * F.lit(weights[f] / total_w)
            for f in weights
        ),
        F.lit(0.0),
    )
    sims = [F.round(scores[f], 6).alias(f"sim_{f}") for f in scores]
    return (
        pairs.select(
            "a_id", "b_id", *sims, F.round(score, 6).alias("score")
        )
        .where(F.col("score") >= threshold)
    )
