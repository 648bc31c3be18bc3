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
    kmeans_max_iter: int = 20,
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
        model = KMeans(
            k=n_clusters, seed=seed, featuresCol="_v",
            maxIter=kmeans_max_iter,
        ).fit(vecs)
        return [[float(v) for v in c] for c in model.clusterCenters()]
    raise ValueError(f"centers must be 'seed' or 'kmeans', got {centers!r}")


def assign_clusters(
    corpus: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "seed",
    seed: int = 23,
    method: str = "auto",
    kmeans_max_iter: int = 20,
) -> DataFrame:
    """Add an argmax-cosine ``cluster`` column; ties break to the
    lowest cluster id (deterministic, matches the oracle's ORDER BY).

    Two physical strategies, both shuffle-free narrow maps:

    - ``method='literal'`` (auto for k <= 32): centers baked into one
      JVM projection — zero Python, SQL-replayable. The expression
      tree grows O(k x d), so large k would drown Catalyst/codegen.
    - ``method='arrow'`` (auto for k > 32): one vectorized numpy
      ``X @ C.T`` per Arrow batch under ``mapInArrow`` — the
      SemDeDup-at-scale path (k ~ 100k cells needs BLAS, not
      expression trees).
    """
    import numpy as np

    ctrs = _center_rows(
        corpus, n_clusters, id_col, vec_col, centers, seed, kmeans_max_iter
    )
    if method == "auto":
        method = "literal" if len(ctrs) <= 32 else "arrow"
    if method == "arrow":
        unit = np.stack(
            [np.asarray(c, dtype=np.float64) / np.linalg.norm(c) for c in ctrs]
        )
        return _assign_arrow(corpus, unit, vec_col)
    if method != "literal":
        raise ValueError(f"method must be auto|literal|arrow, got {method!r}")
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


def _assign_arrow(corpus: DataFrame, unit_centers, vec_col: str) -> DataFrame:
    """Vectorized argmax-dot assignment: one BLAS matmul per Arrow
    batch, centers shipped once per task via closure capture. Output
    schema = input schema + cluster int (np.argmax ties -> lowest
    index, same contract as the literal path)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    C = np.ascontiguousarray(np.asarray(unit_centers, dtype=np.float64).T)
    out_schema = T.StructType(
        list(corpus.schema.fields)
        + [T.StructField("cluster", T.IntegerType(), False)]
    )

    def fn(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index(vec_col))
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.astype(np.float64, copy=False).reshape(len(col), -1)
            cl = (X @ C).argmax(axis=1).astype(np.int32)
            yield b.append_column(
                "cluster", pa.array(cl, type=pa.int32())
            )

    return corpus.mapInArrow(fn, out_schema)


def semantic_dedup_pairs(
    corpus: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "seed",
    seed: int = 23,
    method: str = "auto",
    kmeans_max_iter: int = 20,
    pairs_method: str = "auto",
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (cluster, a_id, b_id, sim)
    with a_id < b_id and cosine ≥ threshold. The equi-join on
    ``cluster`` bounds candidates to same-cell vectors — the SemDeDup
    trade: cross-cluster near-dups are missed by construction, the
    pair count drops from C(n,2) to Σ C(|cell|,2).

    Pair scoring has two physical strategies:

    - ``pairs_method='sql'`` (auto when ``centers='seed'``): equi-join
      on cluster + per-pair JVM cosine fold — exactly replayable by
      the DuckDB oracle (v07), right for small cells.
    - ``pairs_method='arrow'`` (auto otherwise): per-cluster BLAS
      Gram matrix under ``applyInPandas`` — the published SemDeDup
      implementation shape. A 2k-vector cell is ONE d×2k² matmul
      instead of 2M expression-tree folds; measured 521 s → tens of
      seconds at 500k×64 / 256 cells. Row-chunked (2048) so peak
      memory per task is |cell|×2048 doubles, not |cell|².
    """
    assigned = assign_clusters(
        fan_out(corpus), n_clusters, id_col, vec_col, centers, seed, method,
        kmeans_max_iter,
    )
    if pairs_method == "auto":
        pairs_method = "sql" if centers == "seed" else "arrow"
    if pairs_method == "arrow":
        return _pairs_arrow(assigned, id_col, vec_col, threshold)
    if pairs_method != "sql":
        raise ValueError(
            f"pairs_method must be auto|sql|arrow, got {pairs_method!r}"
        )
    lhs = assigned.select(
        "cluster",
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
    )
    rhs = lhs.select(
        "cluster",
        F.col("a_id").alias("b_id"),
        F.col("a_vec").alias("b_vec"),
    )
    return (
        lhs.join(rhs, "cluster")
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


def _pairs_arrow(
    assigned: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Per-cluster Gram-matrix pair scoring: one groupBy shuffle on
    cluster, then BLAS inside each group. Emits the same
    (cluster, a_id, b_id, sim) rows as the SQL path (sim rounded to
    6; ties/order identical because ids are sorted per group)."""
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def group_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"cluster": [], "a_id": [], "b_id": [], "sim": []}
            ).astype({"cluster": "int32", "a_id": "int64",
                      "b_id": "int64", "sim": "float64"})
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cl = int(pdf["cluster"].iloc[0])
        out_a, out_b, out_s = [], [], []
        CHUNK = 2048
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            S = np.round(Xn[lo:hi] @ Xn.T, 6)  # (hi-lo) x n
            for r in range(lo, hi):
                row = S[r - lo, r + 1 :]
                hits = np.nonzero(row >= thr)[0] + r + 1
                if hits.size:
                    out_a.append(np.full(hits.size, ids[r]))
                    out_b.append(ids[hits])
                    out_s.append(row[hits - r - 1])
        if not out_a:
            return pd.DataFrame(
                {"cluster": [], "a_id": [], "b_id": [], "sim": []}
            ).astype({"cluster": "int32", "a_id": "int64",
                      "b_id": "int64", "sim": "float64"})
        return pd.DataFrame(
            {
                "cluster": np.int32(cl),
                "a_id": np.concatenate(out_a),
                "b_id": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        group_pairs, "cluster int, a_id long, b_id long, sim double"
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "seed",
    seed: int = 23,
    method: str = "auto",
) -> DataFrame:
    """Survivor set: drop every vector that has a LOWER-id neighbor
    above the threshold in its cluster (the same lowest-id-survives
    canonicalization as ``graph.dedup_canonical``). One anti-join on
    the pair set's b_id side."""
    pairs = semantic_dedup_pairs(
        corpus, n_clusters, threshold, id_col, vec_col, centers, seed, method
    )
    drops = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return corpus.join(drops, id_col, "left_anti")
