"""Exact distributed k-nearest-neighbors.

Reference: ``dislib/neighbors/base.py:36-199`` (each query block
scans all fit blocks, per-block sklearn NN, merge keeping k
smallest) and ``classification/knn/base.py:77-150`` (vote).

Spark-first: the blockwise scan+merge is a broadcast of the (small)
query set against the corpus scan + a per-query top-k window — the
same O(|corpus|·|queries|) work without materializing a crossJoin
driver-side. For corpus-sized query sets, swap in the LSH path
(``dislib_spark.vector.search.lsh_topk``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sq_euclidean(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kneighbors(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Exact kNN by euclidean distance. Returns
    (q_id, c_id, dist, rank[, extra corpus cols]), ties on distance
    broken by c_id (deterministic, SQL-replayable)."""
    extra = extra_cols or []
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"), *extra
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "q_id",
        "c_id",
        F.round(F.sqrt(_sq_euclidean(F.col("q_vec"), F.col("c_vec"))), 6).alias(
            "dist"
        ),
        *extra,
    )
    w = Window.partitionBy("q_id").orderBy("dist", "c_id")
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    weights="uniform",
) -> DataFrame:
    """Weighted-vote kNN classification (reference
    classification/knn/base.py:29-39,77-150). Ties → smaller label.

    ``weights``: ``'uniform'`` (each neighbor one vote),
    ``'distance'`` (1/dist votes, with sklearn's exact-match rule:
    if any neighbor is at distance 0, only zero-distance neighbors
    vote), or a callable ``Column -> Column`` mapping the distance
    column to a weight column (the Spark analogue of sklearn's
    array-callable). Returns (q_id, pred_label)."""
    nn = kneighbors(
        queries, corpus, k, id_col, vec_col, extra_cols=[label_col]
    )
    if weights == "uniform":
        wt = F.lit(1.0)
    elif weights == "distance":
        per_q = Window.partitionBy("q_id")
        has_zero = F.max((F.col("dist") == 0).cast("int")).over(per_q) == 1
        wt = (
            F.when(has_zero & (F.col("dist") == 0), F.lit(1.0))
            .when(has_zero, F.lit(0.0))
            .otherwise(F.lit(1.0) / F.col("dist"))
        )
    elif callable(weights):
        wt = weights(F.col("dist"))
    else:
        raise ValueError(f"weights must be 'uniform', 'distance' or callable, got {weights!r}")
    votes = (
        nn.withColumn("_wt", wt)
        .groupBy("q_id", label_col)
        .agg(F.sum("_wt").alias("votes"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.col(label_col))
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("q_id", F.col(label_col).alias("pred_label"))
    )


class NearestNeighbors:
    """sklearn-style facade (reference neighbors/base.py:36)."""

    def __init__(self, n_neighbors: int = 5):
        self.n_neighbors = n_neighbors
        self._corpus: DataFrame | None = None
        self._id_col = "vec_id"
        self._vec_col = "embedding"

    def fit(self, corpus: DataFrame, id_col: str = "vec_id",
            vec_col: str = "embedding") -> "NearestNeighbors":
        self._corpus = corpus
        self._id_col = id_col
        self._vec_col = vec_col
        return self

    def kneighbors(self, queries: DataFrame, n_neighbors: int | None = None) -> DataFrame:
        return kneighbors(
            queries,
            self._corpus,
            n_neighbors or self.n_neighbors,
            self._id_col,
            self._vec_col,
        )


class KNeighborsClassifier:
    """sklearn-style facade (reference classification/knn/base.py)."""

    def __init__(self, n_neighbors: int = 5, weights="uniform"):
        self.n_neighbors = n_neighbors
        self.weights = weights
        self._corpus: DataFrame | None = None
        self._cols = ("vec_id", "embedding", "label")

    def fit(self, corpus: DataFrame, id_col: str = "vec_id",
            vec_col: str = "embedding", label_col: str = "label"):
        self._corpus = corpus
        self._cols = (id_col, vec_col, label_col)
        return self

    def predict(self, queries: DataFrame) -> DataFrame:
        id_col, vec_col, label_col = self._cols
        return knn_classify(
            queries, self._corpus, self.n_neighbors, id_col, vec_col,
            label_col, weights=self.weights,
        )
