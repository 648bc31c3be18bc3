"""Repetition-based quality metrics for LLM training corpora
(Gopher/Dolma-style filters: duplicate n-gram fraction, top n-gram
share). N/A in the reference (no text layer); part of this engine's
training-pipeline surface.

Scale design: every metric is a per-row JVM higher-order-function
fold over the doc's own token array — ZERO shuffle, whole-stage
codegen, embarrassingly parallel at any corpus size. The per-row
cost is O(n log n) (one array_sort + one linear fold), bounded by
doc length, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dislib_spark.text.contamination import word_ngrams
from dislib_spark.utils.base import fan_out


def duplicate_ngram_fraction(grams: Column) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    occurrence: ``1 - distinct/total`` (0 when the doc is too short
    to have any gram)."""
    total = F.size(grams)
    return F.when(
        total > 0,
        F.round(
            1.0 - F.size(F.array_distinct(grams)) / total.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def top_ngram_share(sorted_grams: Column) -> Column:
    """Share of gram occurrences taken by the single most frequent
    gram (Gopher's "fraction of characters in most common n-gram",
    occurrence-weighted).

    ``sorted_grams`` MUST be a pre-sorted NAMED column
    (``array_sort`` projected upstream): equal grams are then
    adjacent, so the max occurrence count is the longest equal-run —
    one linear ``aggregate`` fold over the elements, no per-distinct
    rescans (the naive distinct×filter form is O(n²) per doc and
    took minutes at sf0.1)."""
    total = F.size(sorted_grams)
    longest_run = F.aggregate(
        sorted_grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            # x == NULL prev → NULL → otherwise branch: run restarts.
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(
        total > 0,
        F.round(longest_run / total.cast("double"), 6),
    ).otherwise(F.lit(0.0))


def with_repetition_features(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Add ``dup3_frac`` (duplicate 3-gram fraction) and
    ``top2_share`` (most-common-2-gram share) columns.

    Gram arrays are projected to NAMED columns first — Catalyst does
    no common-subexpression elimination inside HOF lambda bodies, so
    reusing an inline ``word_ngrams(...)`` expression would re-split
    the text once per reference. The 2-gram array is projected
    PRE-SORTED for the same reason: ``top_ngram_share``'s fold
    touches every element, and an inline ``array_sort`` would re-sort
    per element access."""
    staged = fan_out(df).withColumn(
        "_g2s", F.array_sort(word_ngrams(F.col(text_col), 2))
    ).withColumn("_g3", word_ngrams(F.col(text_col), 3))
    return (
        staged.withColumn(
            "dup3_frac", duplicate_ngram_fraction(F.col("_g3"))
        )
        .withColumn("top2_share", top_ngram_share(F.col("_g2s")))
        .drop("_g2s", "_g3")
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup3_frac: float = 0.30,
    max_top2_share: float = 0.20,
) -> DataFrame:
    """Drop documents over either repetition threshold (defaults are
    in the neighbourhood of Gopher's published cutoffs). Pure
    filter — composes with predicate pushdown when the thresholds
    can be expressed against stored columns."""
    feat = with_repetition_features(df, text_col)
    return feat.where(
        (F.col("dup3_frac") <= max_dup3_frac)
        & (F.col("top2_share") <= max_top2_share)
    ).drop("dup3_frac", "top2_share")
