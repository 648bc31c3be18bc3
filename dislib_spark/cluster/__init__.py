from dislib_spark.cluster.kmeans import KMeans, assign_to_centers, lloyd_fit
from dislib_spark.cluster.gmm import GaussianMixture
from dislib_spark.cluster.dbscan import DBSCAN
from dislib_spark.cluster.daura import Daura

__all__ = ["KMeans", "assign_to_centers", "lloyd_fit", "GaussianMixture", "DBSCAN", "Daura"]
