"""Embedding-population telemetry: per-group centroid geometry.

The drift/QA pass of an embedding pipeline (did a re-embed or a new
source shift a population? are two label groups collapsing?): compute
each group's mean vector and the pairwise cosine between group
centroids. Published practice (centroid similarity / drift monitors);
N/A in the reference.

Scale: the corpus touches ONE (group, dim) average — long-form
explode then a map-side-combined grouped mean, |groups|·d reduce
state — after which the centroid pair join is dimension-table-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out


def group_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, k, c) long-form per-group mean vectors — one grouped
    average over the exploded corpus."""
    return (
        fan_out(df)
        .select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "k", "v"
            ),
        )
        .groupBy("label", "k")
        .agg(F.avg("v").alias("c"))
    )


def centroid_similarity(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine between group centroids: (label_a, label_b,
    cos) for label_a < label_b, rounded to 6 places. The centroid
    table is |groups|·d rows, so the pair join never touches the
    corpus again."""
    cents = group_centroids(df, label_col, vec_col)
    a = cents.select(
        F.col("label").alias("label_a"), "k", F.col("c").alias("ca")
    )
    b = cents.select(
        F.col("label").alias("label_b"), "k", F.col("c").alias("cb")
    )
    return (
        a.join(b, "k")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sum(F.col("ca") * F.col("ca")).alias("na2"),
            F.sum(F.col("cb") * F.col("cb")).alias("nb2"),
        )
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2")), 6
            ).alias("cos"),
        )
    )
