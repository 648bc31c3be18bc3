from dislib_spark.neighbors.knn import KNeighborsClassifier, NearestNeighbors, kneighbors, knn_classify

__all__ = ["KNeighborsClassifier", "NearestNeighbors", "kneighbors", "knn_classify"]
