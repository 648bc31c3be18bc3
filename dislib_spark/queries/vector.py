"""Similarity-search extension queries over ``embeddings`` with
DuckDB oracles.

Exact paths (brute-force cosine top-k, near-dup pairs) are oracle-
checked via explicit unnest-join dot products in double precision.
LSH / IVF approximate paths use Spark-side hashing / MLlib KMeans —
not ANSI-replayable → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dislib_spark.tables import load_table
from dislib_spark.vector.search import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
    neardup_pairs,
)


def v01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return cosine_topk(q, e, k=10).orderBy("q_id", "rank")


def v02_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    return neardup_pairs(e, threshold=0.2).orderBy("a_id", "b_id")


def v03_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return lsh_topk(q, e, k=10).orderBy("q_id", "rank")


def v04_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return ivf_topk(q, e, k=10).orderBy("q_id", "rank")


QUERIES = {
    "v01_cosine_topk": v01_cosine_topk,
    "v02_neardup_pairs": v02_neardup_pairs,
    "v03_lsh_topk": v03_lsh_topk,
    "v04_ivf_topk": v04_ivf_topk,
}

# cells CTE: (vec_id, k, v) in double; norms CTE: per-vector L2 norm.
_CELLS = """
    SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
           CAST(UNNEST(embedding) AS DOUBLE) AS v
    FROM embeddings
"""

ORACLE = {
    "v01_cosine_topk": f"""
        WITH cells AS ({_CELLS}),
        norms AS (
            SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
        ),
        dots AS (
            SELECT a.vec_id AS q_id, b.vec_id AS c_id, SUM(a.v * b.v) AS dot
            FROM cells a JOIN cells b ON a.k = b.k
            WHERE a.vec_id < 5
            GROUP BY a.vec_id, b.vec_id
        ),
        scored AS (
            SELECT d.q_id, d.c_id,
                   ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots d
            JOIN norms na ON na.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.c_id
        )
        SELECT q_id, c_id, sim, rank FROM (
            SELECT q_id, c_id, sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY sim DESC, c_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= 10 ORDER BY q_id, rank
    """,
    "v02_neardup_pairs": f"""
        WITH cells AS (
            SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings WHERE vec_id < 300
        ),
        norms AS (
            SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
        ),
        dots AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id, SUM(a.v * b.v) AS dot
            FROM cells a JOIN cells b ON a.k = b.k AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id
        )
        SELECT a_id, b_id, sim FROM (
            SELECT d.a_id, d.b_id,
                   ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots d
            JOIN norms na ON na.vec_id = d.a_id
            JOIN norms nb ON nb.vec_id = d.b_id
        ) WHERE sim >= 0.2 ORDER BY a_id, b_id
    """,
    # v03/v04: approximate (hash/KMeans-seeded) — rows-only by design.
}
