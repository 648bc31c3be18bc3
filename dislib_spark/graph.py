"""Connected components over an edge list, and dedup-cluster
canonicalization built on it.

Near-dup pipelines produce PAIRS (Jaccard/MinHash/SimHash/embedding);
to actually deduplicate you need the transitive clusters and one
canonical survivor per cluster. N/A in the reference (no graph/text
layer); part of this engine's training-pipeline surface.

Scale design: min-label propagation as iterated DataFrame joins —
each round is one shuffle join (edges ⋈ labels) + one groupBy-min,
all JVM-side, converging in O(cluster diameter) rounds. Near-dup
clusters are shallow (boilerplate stars: diameter ≤ 2-3), so the
round count is small and independent of corpus size. Lineage is cut
with ``localCheckpoint`` per round so the plan doesn't grow
exponentially; convergence is detected with a count of changed
labels (one action per round, unavoidable for an iterative fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it. Returns (node, component).

    Raises if the fixpoint is not reached within ``max_iter`` rounds
    (pathological chain graphs) rather than returning a silently
    under-merged labeling.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # each node offers its current label to every neighbour; the
        # node keeps the min of its own label and all offers
        offers = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), "component")
        )
        new = (
            labels.select("node", "component")
            .union(offers)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") < F.col("o.component"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a_id",
    dst: str = "b_id",
) -> DataFrame:
    """Keep one canonical row per near-dup cluster (the minimum id)
    plus every row that appears in no pair. The standard last step of
    a dedup pipeline: pairs → clusters → survivors.

    The drop set (cluster members that are not their component's
    minimum) is joined back as a broadcast-friendly anti-join — at
    100 TB the drop set is proportional to the DUPLICATED subset, not
    the corpus."""
    cc = connected_components(pairs, src=src, dst=dst)
    drop = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
