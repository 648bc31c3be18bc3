"""Semantic (embedding-space) deduplication — SemDeDup-style.

Cluster the embedding space, then search for near-duplicate pairs
ONLY within each cluster (Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", 2023 — public
paper). This is the curation operator that removes *semantically*
redundant documents which survive exact/MinHash dedup because their
surface text differs.

Scale design (100 TB):

- **Assignment is a narrow map, zero shuffle**: the k centroids are
  tiny (k × d floats) and are baked into ONE projection as literal
  expressions (same pattern as ``cluster.kmeans.assign_to_centers``,
  exercised by m03). No crossJoin, no window — every row computes its
  argmax-cosine cluster inside whole-stage codegen.
- **The pair join is candidate-bounded**: vectors only meet vectors
  in the same cluster, so the join is an equi-join on ``cluster``
  whose output is Σ C(|cluster|,2) instead of C(n,2). At the 100 TB
  target, pick ``n_clusters ≈ n / target_cluster_size`` (SemDeDup
  uses ~100k clusters for web-scale corpora) so each cluster fits a
  task; AQE skew-split handles residual imbalance.
- Two centroid sources: ``centers='seed'`` takes the first
  ``n_clusters`` corpus vectors as centroids — fully deterministic
  and SQL-replayable (the v07 oracle re-derives the same assignment
  in DuckDB); ``centers='kmeans'`` fits MLlib KMeans (the production
  path — better-balanced cells, not ANSI-replayable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out
from dislib_spark.vector.search import cosine_similarity


def _center_rows(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str,
    vec_col: str,
    centers: str,
    seed: int,
) -> list[list[float]]:
    """Materialize the k centroid vectors on the driver (k×d floats —
    tiny at any corpus scale; this is the only driver collect)."""
    if centers == "seed":
        rows = (
            corpus.where(F.col(id_col) < n_clusters)
            .orderBy(id_col)
            .select(F.col(vec_col).cast("array<double>").alias("c"))
            .collect()
        )
        return [list(r["c"]) for r in rows]
    if centers == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vecs = corpus.select(
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
        )
        model = KMeans(k=n_clusters, seed=seed, featuresCol="_v").fit(vecs)
        return [[float(v) for v in c] for c in model.clusterCenters()]
    raise ValueError(f"centers must be 'seed' or 'kmeans', got {centers!r}")


def assign_clusters(
    corpus: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "seed",
    seed: int = 23,
) -> DataFrame:
    """Add an argmax-cosine ``cluster`` column. Literal-center
    projection — no shuffle, no Python; ties break to the lowest
    cluster id (deterministic, matches the oracle's ORDER BY)."""
    import numpy as np

    ctrs = _center_rows(corpus, n_clusters, id_col, vec_col, centers, seed)
    # Unit-normalize the centers on the driver: argmax over plain dot
    # products equals argmax over cosines (the row norm is a shared
    # positive factor), so the per-row expression needs no sqrt and —
    # critically — each center's dot is evaluated exactly ONCE. The
    # earlier greatest()+when-chain form re-evaluated every 64-term
    # fold ~3x (no CSE across when branches), which cost seconds of
    # Catalyst/codegen time per query.
    unit = [
        (np.asarray(c, dtype=np.float64) / np.linalg.norm(c)).tolist()
        for c in ctrs
    ]
    vec = F.col(vec_col)
    dots = [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(v)) for v in c]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for c in unit
    ]
    # argmax with ties to the LOWEST cluster id: array_position finds
    # the first occurrence of the max (1-based).
    staged = corpus.withColumn("_sims", F.array(*dots))
    return staged.withColumn(
        "cluster",
        (
            F.array_position(F.col("_sims"), F.array_max(F.col("_sims"))) - 1
        ).cast("int"),
    ).drop("_sims")


def semantic_dedup_pairs(
    corpus: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "seed",
    seed: int = 23,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (cluster, a_id, b_id, sim)
    with a_id < b_id and cosine ≥ threshold. The equi-join on
    ``cluster`` bounds candidates to same-cell vectors — the SemDeDup
    trade: cross-cluster near-dups are missed by construction, the
    pair count drops from C(n,2) to Σ C(|cell|,2)."""
    assigned = assign_clusters(
        fan_out(corpus), n_clusters, id_col, vec_col, centers, seed
    ).select(
        "cluster",
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
    )
    rhs = assigned.select(
        "cluster",
        F.col("a_id").alias("b_id"),
        F.col("a_vec").alias("b_vec"),
    )
    return (
        assigned.join(rhs, "cluster")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "cluster",
            "a_id",
            "b_id",
            F.round(
                cosine_similarity(F.col("a_vec"), F.col("b_vec")), 6
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "seed",
    seed: int = 23,
) -> DataFrame:
    """Survivor set: drop every vector that has a LOWER-id neighbor
    above the threshold in its cluster (the same lowest-id-survives
    canonicalization as ``graph.dedup_canonical``). One anti-join on
    the pair set's b_id side."""
    pairs = semantic_dedup_pairs(
        corpus, n_clusters, threshold, id_col, vec_col, centers, seed
    )
    drops = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return corpus.join(drops, id_col, "left_anti")
