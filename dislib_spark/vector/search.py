"""Vector similarity search over embedding columns.

Operates on the ``embeddings`` schema (vec_id BIGINT,
embedding ARRAY<FLOAT>, label INT — FIXTURES.md §A).

Three tiers for the 100 TB target:

- ``cosine_topk``: brute-force exact top-k — query set broadcast
  against the corpus (one narrow map + per-query top-k window). The
  correctness baseline; linear in corpus size, embarrassingly
  parallel.
- ``lsh_topk``: random-hyperplane LSH bucketing (signed projections →
  bucket join) — candidates only from matching buckets, the scale
  path when the corpus no longer admits a full scan per query batch.
- ``ivf_topk``: IVF-style coarse quantization — KMeans centroids as
  the inverted index, probe the nearest n_probe cells only.

Dot products / norms are JVM higher-order functions
(zip_with/aggregate) — no Python in the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against
    the corpus scan; rank per query with a window.

    Returns (q_id, c_id, sim, rank), rank 1..k, ties broken by c_id.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "q_id",
        "c_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ threshold).

    Brute-force form (all-pairs); at scale use ``lsh_topk`` buckets to
    restrict candidates first. Returns (a_id, b_id, sim), a_id < b_id.
    """
    a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(cosine_similarity(F.col("a_vec"), F.col("b_vec")), 6).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(<v, plane_i>)."""
    bits = []
    for plane in planes:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: join queries to corpus on the LSH bucket,
    exact cosine within the bucket. The bucket join replaces the full
    crossJoin — candidate count scales with bucket occupancy, not
    corpus size. Returns (q_id, c_id, sim, rank).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = F.broadcast(q).join(c, "bucket").select(
        "q_id",
        "c_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse-quantized ANN: KMeans centroids form the inverted
    index; each corpus vector is assigned to its nearest cell; each
    query probes its n_probe nearest cells and scores only those
    candidate lists. Returns (q_id, c_id, sim, rank)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_vec = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="_v", predictionCol="cell")
    model = km.fit(corpus_vec)
    assigned = model.transform(corpus_vec).select("c_id", "c_vec", "cell")

    centers = model.clusterCenters()
    center_rows = [(i, [float(v) for v in ctr]) for i, ctr in enumerate(centers)]
    centers_df = queries.sparkSession.createDataFrame(
        center_rows, "cell int, center array<double>"
    )
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    # nearest n_probe cells per query (centers are tiny → broadcast)
    qc = q.crossJoin(F.broadcast(centers_df)).select(
        "q_id",
        "q_vec",
        "cell",
        F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("center"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d2"),
    )
    wq = Window.partitionBy("q_id").orderBy("d2", "cell")
    probes = qc.withColumn("pr", F.row_number().over(wq)).where(
        F.col("pr") <= n_probe
    ).select("q_id", "q_vec", "cell")

    scored = F.broadcast(probes).join(assigned, "cell").select(
        "q_id",
        "c_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
