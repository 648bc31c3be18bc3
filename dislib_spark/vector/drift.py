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


def centroid_medoids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
) -> DataFrame:
    """(label, id, cos, rank) — each group's ``k`` most central
    members by cosine to the group's own mean vector: the cheap
    medoid approximation used to pick cluster representatives /
    canonical exemplars after any grouping (the member-level
    companion of :func:`centroid_similarity`; SemDeDup keeps the
    same per-cluster "closest to centroid" winner).

    Scale: centroids come from ONE grouped mean (|groups|·d state);
    they broadcast back onto the exploded corpus keyed (label, dim),
    so scoring is a map-side join + one grouped dot product — the
    corpus is read once and never self-joined. Ranking is a
    partitionBy(label) window on the 9-dp-rounded cosine (six orders
    above centroid summation-order drift) with an id tiebreak — and
    because the rank filter is ``row_number() <= k``, Catalyst's
    WindowGroupLimit rewrites it into the two-phase top-k: a PARTIAL
    per-map-task top-k runs BEFORE the label exchange (each task
    ships at most k rows per label) and the final Window sees at most
    k·num_partitions rows per label, never the corpus — low label
    cardinality therefore does NOT funnel the data through ~|labels|
    reducers (plan-pinned in tests/test_plans.py).
    """
    from pyspark.sql import Window

    cents = group_centroids(df, label_col, vec_col)
    cn = cents.groupBy("label").agg(
        F.sum(F.col("c") * F.col("c")).alias("c2")
    )
    ex = fan_out(df).select(
        F.col(label_col).alias("label"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "k", "v"
        ),
    )
    per_vec = (
        ex.join(F.broadcast(cents), ["label", "k"])
        .groupBy("label", "_id")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("v2"),
        )
    )
    cos = F.col("dot") / (F.sqrt("v2") * F.sqrt("c2"))
    w = Window.partitionBy("label").orderBy(
        F.desc(F.round(cos, 9)), "_id"
    )
    return (
        per_vec.join(F.broadcast(cn), "label")
        .select(
            "label",
            F.col("_id").alias(id_col),
            F.round(cos, 6).alias("cos"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
        .orderBy("label", "rank")
    )


def dimension_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    round_dp: int = 7,
) -> DataFrame:
    """Per-dimension feature statistics of an embedding column —
    mean / population variance / min / max for every coordinate: the
    whitening-diagnostic (dead dims, scale outliers, variance
    collapse after a bad encoder deploy) read before PCA/SQ8/PQ pick
    their scales. Complements the per-GROUP centroids of
    ``group_centroids`` with corpus-wide per-DIMENSION moments.

    One posexplode + one map-side-combined aggregate keyed on the
    dimension index — |dims| output rows at any corpus size.
    Values are rounded to ``round_dp`` and carried as DECIMAL so
    Σx and Σx² are ORDER-EXACT on every engine; mean and variance
    are IEEE algebra on those exact sums (float32 inputs carry ~7
    significant digits, so 7-dp rounding is below input noise).

    Returns (dim, n, mean, variance, min_v, max_v).
    """
    v = (
        df.select(
            F.posexplode(F.col(vec_col)).alias("dim", "x0")
        )
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.round(F.col("x0").cast("double"), int(round_dp))
            .cast("decimal(18,7)")
            .alias("x"),
        )
    )
    g = v.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    return g.select(
        "dim",
        F.col("n").cast("bigint").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.col("mn").cast("double").alias("min_v"),
        F.col("mx").cast("double").alias("max_v"),
    ).orderBy("dim")
