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


def pagerank(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    damping: float = 0.85,
    n_iter: int = 10,
    undirected: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list — centrality for
    dedup graphs (rank boilerplate hubs, pick the most-connected
    document as the cluster canonical instead of min-id).

    Returns (node, rank); ranks sum to ~n_nodes (the classic
    unnormalized form: rank = (1-d) + d * sum(in_rank/out_deg)).

    Scale design: each iteration is one shuffle join (edges ⋈ ranks
    on src) + one groupBy-sum on dst — the same plan shape a
    1000-executor cluster wants; degree table computed once;
    ``localCheckpoint`` cuts lineage per round (iterative plans grow
    exponentially otherwise). Dangling nodes (no out-edges) keep the
    (1-d) floor. Fixed iteration count, no convergence action —
    deterministic cost, and 10 rounds is standard for ranking use.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if undirected:
        e = e.union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    e = e.distinct().localCheckpoint()
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    out = e.join(deg, "u")  # (u, v, deg): contribution edges
    nodes = e.select(F.col("u").alias("node")).distinct().localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(n_iter):
        contrib = (
            out.join(ranks, out["u"] == ranks["node"])
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("in_rank"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_count(edges: DataFrame, a_col: str = "a_id",
                   b_col: str = "b_id") -> DataFrame:
    """Count triangles in an undirected graph given canonically
    oriented edges (a < b). Two equi-joins: wedges (a-b-c with
    a<b<c via the orientation) closed by an edge-existence join —
    each triangle counted exactly once.

    Scale note: the canonical orientation is the textbook
    output-bound — joining oriented edges bounds wedge count by
    Σ d_out(v)²; for skewed degree distributions orient by
    (degree, id) instead of raw id before calling (the hub node
    then has small out-degree). Returns one row
    (n_edges, n_triangles)."""
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e1 = e
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    n_e = e.count()
    n_t = tri.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_e, n_t)], "n_edges bigint, n_triangles bigint"
    )


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "a_id",
    dst: str = "b_id",
) -> DataFrame:
    """k-core of the undirected graph ``edges`` by iterative peeling:
    each round drops every vertex whose current degree is < ``k``
    (and its incident edges), the classic spam-clique / dense-cluster
    extractor beside :func:`triangle_count`.

    Semantics are FIXED-ROUND so the result is engine-replayable: the
    output is the graph after exactly ``rounds`` peels (vertex, deg).
    Peeling is monotone, so once the fixpoint is reached further
    rounds are no-ops — the loop exits early when the edge count
    stops shrinking, and the early exit returns the SAME frame the
    full unroll would (an unrolled-CTE oracle with ``rounds`` levels
    replays it exactly whether or not convergence happened).

    Scale shape: each round is one map-side-combined degree aggregate
    plus two semi-joins on the shrinking edge set — cost proportional
    to the SURVIVING edges, never the corpus; ``localCheckpoint`` per
    round cuts the exponential lineage (the connected_components
    recipe above).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    n_edges = sym.count()
    for _ in range(rounds):
        if n_edges == 0:
            break
        keep = (
            sym.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
            .select("u")
        )
        sym = (
            sym.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint()
        )
        n_now = sym.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    return sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
