"""SQL-checkable ML kernel queries.

Each runs a REAL engine code path (normal-equation OLS, scaler fit,
Lloyd assignment, exact kNN vote) whose result is replayable in ANSI
SQL — so the driver's DuckDB harness checks the estimator math
itself, not just relational plumbing. Iterative/seeded estimators
(full KMeans fit, GMM, RF, ALS) are checked against sklearn oracles
in tests/ instead (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dislib_spark.cluster.kmeans import assign_to_centers
from dislib_spark.neighbors.knn import knn_classify
from dislib_spark.preprocessing.scalers import column_stats
from dislib_spark.regression.linear import ols_fit
from dislib_spark.tables import load_table

# Fixed centers for the SQL-checkable Lloyd assignment step
# (l_quantity, l_discount space).
_M03_CENTERS = [[10.0, 0.02], [30.0, 0.05], [45.0, 0.08]]


def m01_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS on lineitem (quantity → extendedprice) via the engine's
    distributed normal equations (reference
    regression/linear/base.py:274-337)."""
    li = load_table(spark, sf_dir, "lineitem")
    coef, intercept = ols_fit(li, ["l_quantity"], "l_extendedprice")
    return spark.createDataFrame(
        [(round(float(coef[0]), 6), round(float(intercept), 6))],
        "slope double, intercept double",
    )


def m02_scaler_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler/MinMaxScaler fit statistics (reference
    preprocessing/standard_scaler.py:38-60, minmax_scaler.py:36-51)."""
    li = load_table(spark, sf_dir, "lineitem")
    return column_stats(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    ).orderBy("col_name")


def m03_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step with fixed centers (reference
    _partial_sum kmeans/base.py:385-399) — per-cluster counts and
    feature sums, the exact partial the reference tree-merges."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.array(
            F.col("l_quantity").cast("double"),
            F.col("l_discount").cast("double"),
        ).alias("feat")
    )
    assigned = assign_to_centers(li, "feat", _M03_CENTERS)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.element_at("feat", 1)), 6).alias("sum_qty"),
            F.round(F.sum(F.element_at("feat", 2)), 6).alias("sum_disc"),
        )
        .orderBy("cluster")
    )


def m04_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN majority vote: embeddings vec_id<20 as queries,
    the rest as labelled corpus (reference
    classification/knn/base.py:77-150)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    c = e.where(F.col("vec_id") >= 20)
    return knn_classify(q, c, k=5).orderBy("q_id")


def m05_pca_total_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA on embeddings: the eigenvalue sum must equal the total
    per-column variance (trace identity) — checks the distributed
    Gramian + eigh pipeline against a pure-SQL oracle."""
    from dislib_spark.array.core import DsArray
    from dislib_spark.decomposition import PCA

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    n = e.count()
    pca = PCA().fit(DsArray(e, (n, 64)))
    total = float(pca.explained_variance_.sum())
    return spark.createDataFrame(
        [(round(total, 6),)], "total_variance double"
    )


def m06_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS via the engine's normal equations vs a Cramer-
    rule SQL oracle (multi-regressor REGR_* doesn't exist in SQL)."""
    li = load_table(spark, sf_dir, "lineitem")
    coef, intercept = ols_fit(
        li, ["l_quantity", "l_discount"], "l_extendedprice"
    )
    return spark.createDataFrame(
        [
            (
                round(float(coef[0]), 6),
                round(float(coef[1]), 6),
                round(float(intercept), 6),
            )
        ],
        "w_qty double, w_disc double, intercept double",
    )


QUERIES = {
    "m01_ols_normal_eq": m01_ols_normal_eq,
    "m02_scaler_stats": m02_scaler_stats,
    "m03_kmeans_assign": m03_kmeans_assign,
    "m04_knn_classify": m04_knn_classify,
    "m05_pca_total_variance": m05_pca_total_variance,
    "m06_ols_two_features": m06_ols_two_features,
}


def _dist2(cx: float, cd: float) -> str:
    return (
        f"(l_quantity - {cx}) * (l_quantity - {cx})"
        f" + (l_discount - {cd}) * (l_discount - {cd})"
    )


_D = [_dist2(c[0], c[1]) for c in _M03_CENTERS]

ORACLE = {
    "m01_ols_normal_eq": """
        SELECT ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS intercept
        FROM lineitem
    """,
    "m02_scaler_stats": """
        SELECT col_name, mean, std_pop, cmin, cmax FROM (
            SELECT 'l_quantity' AS col_name,
                   ROUND(AVG(l_quantity), 6) AS mean,
                   ROUND(STDDEV_POP(l_quantity), 6) AS std_pop,
                   ROUND(MIN(l_quantity), 6) AS cmin,
                   ROUND(MAX(l_quantity), 6) AS cmax
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice',
                   ROUND(AVG(l_extendedprice), 6),
                   ROUND(STDDEV_POP(l_extendedprice), 6),
                   ROUND(MIN(l_extendedprice), 6),
                   ROUND(MAX(l_extendedprice), 6)
            FROM lineitem
            UNION ALL
            SELECT 'l_discount',
                   ROUND(AVG(l_discount), 6),
                   ROUND(STDDEV_POP(l_discount), 6),
                   ROUND(MIN(l_discount), 6),
                   ROUND(MAX(l_discount), 6)
            FROM lineitem
        ) ORDER BY col_name
    """,
    "m03_kmeans_assign": f"""
        SELECT cluster, COUNT(*) AS n,
               ROUND(SUM(l_quantity), 6) AS sum_qty,
               ROUND(SUM(l_discount), 6) AS sum_disc
        FROM (
            SELECT l_quantity, l_discount,
                   CASE
                       WHEN {_D[0]} = LEAST({_D[0]}, {_D[1]}, {_D[2]}) THEN 0
                       WHEN {_D[1]} = LEAST({_D[0]}, {_D[1]}, {_D[2]}) THEN 1
                       ELSE 2
                   END AS cluster
            FROM lineitem
        ) GROUP BY cluster ORDER BY cluster
    """,
    "m05_pca_total_variance": """
        SELECT ROUND(SUM(v), 6) AS total_variance FROM (
            SELECT VAR_POP(ev) AS v FROM (
                SELECT GENERATE_SUBSCRIPTS(embedding, 1) AS k,
                       CAST(UNNEST(embedding) AS DOUBLE) AS ev
                FROM embeddings
            ) GROUP BY k
        )
    """,
    "m06_ols_two_features": """
        WITH s AS (
            SELECT COUNT(*)::DOUBLE AS n,
                   SUM(l_quantity) AS sx1, SUM(l_discount) AS sx2,
                   SUM(l_extendedprice) AS sy,
                   SUM(l_quantity * l_quantity) AS s11,
                   SUM(l_quantity * l_discount) AS s12,
                   SUM(l_discount * l_discount) AS s22,
                   SUM(l_quantity * l_extendedprice) AS s1y,
                   SUM(l_discount * l_extendedprice) AS s2y
            FROM lineitem
        ),
        d AS (
            SELECT *,
                   s11*(s22*n - sx2*sx2) - s12*(s12*n - sx2*sx1)
                       + sx1*(s12*sx2 - s22*sx1) AS det
            FROM s
        )
        SELECT
            ROUND((s1y*(s22*n - sx2*sx2) - s12*(s2y*n - sx2*sy)
                   + sx1*(s2y*sx2 - s22*sy)) / det, 6) AS w_qty,
            ROUND((s11*(s2y*n - sy*sx2) - s1y*(s12*n - sx2*sx1)
                   + sx1*(s12*sy - s2y*sx1)) / det, 6) AS w_disc,
            ROUND((s11*(s22*sy - s2y*sx2) - s12*(s12*sy - s2y*sx1)
                   + s1y*(s12*sx2 - s22*sx1)) / det, 6) AS intercept
        FROM d
    """,
    "m04_knn_classify": """
        WITH cells AS (
            SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        dists AS (
            SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                   ANY_VALUE(b.label) AS label,
                   ROUND(SQRT(SUM((a.v - b.v) * (a.v - b.v))), 6) AS dist
            FROM cells a JOIN cells b ON a.k = b.k
            WHERE a.vec_id < 20 AND b.vec_id >= 20
            GROUP BY a.vec_id, b.vec_id
        ),
        nn AS (
            SELECT q_id, c_id, label FROM (
                SELECT q_id, c_id, label,
                       ROW_NUMBER() OVER (
                           PARTITION BY q_id ORDER BY dist, c_id) AS rank
                FROM dists
            ) WHERE rank <= 5
        ),
        votes AS (
            SELECT q_id, label, COUNT(*) AS votes FROM nn
            GROUP BY q_id, label
        )
        SELECT q_id, pred_label FROM (
            SELECT q_id, label AS pred_label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY votes DESC, label) AS rk
            FROM votes
        ) WHERE rk = 1 ORDER BY q_id
    """,
}
