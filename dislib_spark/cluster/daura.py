"""Daura clustering over a precomputed distance matrix.

Reference: ``dislib/cluster/daura/base.py:12-123`` — repeatedly pick
the sample with the most neighbors within ``cutoff`` as a cluster
center, remove the cluster, iterate until no candidate has >1
member.

Spark-first: the distance matrix becomes an EDGE TABLE
(i, j, dist ≤ cutoff); each round is one groupBy-count + orderBy-
limit(1) (argmax) + anti-join removal — the reference's
``_find_largest_cluster`` (:101-105) as two shuffles per round on a
shrinking edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Daura:
    """reference cluster/daura/base.py:12-73."""

    def __init__(self, cutoff: float):
        self.cutoff = cutoff
        self.clusters_: list[list[int]] | None = None

    def fit_predict(self, distances: DataFrame, i_col: str = "i",
                    j_col: str = "j", dist_col: str = "dist") -> list[list[int]]:
        """distances: long-form pairwise distance table (both (i,j)
        and (j,i) present, or symmetric by construction). Returns
        clusters as lists of sample ids, largest first."""
        edges = (
            distances.where(F.col(dist_col) <= self.cutoff)
            .select(F.col(i_col).alias("i"), F.col(j_col).alias("j"))
        )
        # ensure reflexive membership (a sample neighbors itself)
        nodes = edges.select(F.col("i").alias("n")).distinct()
        edges = edges.unionAll(
            nodes.select(F.col("n").alias("i"), F.col("n").alias("j"))
        ).distinct().cache()

        clusters: list[list[int]] = []
        try:
            while True:
                counts = edges.groupBy("i").agg(F.count(F.lit(1)).alias("deg"))
                top = counts.orderBy(F.desc("deg"), "i").limit(1).collect()
                if not top or top[0]["deg"] <= 1:
                    break
                center = top[0]["i"]
                members = [
                    r["j"]
                    for r in edges.where(F.col("i") == center).select("j").collect()
                ]
                clusters.append(sorted(members))
                member_df = edges.sparkSession.createDataFrame(
                    [(m,) for m in members], "m long"
                )
                edges = (
                    edges.join(
                        member_df, edges["i"] == member_df["m"], "left_anti"
                    )
                    .join(member_df, edges["j"] == member_df["m"], "left_anti")
                    .cache()
                )
            # leftovers: singleton clusters
            rest = [r["i"] for r in edges.select("i").distinct().collect()]
            clusters.extend([[v] for v in sorted(rest)])
            self.clusters_ = clusters
            return clusters
        finally:
            edges.unpersist()
