from dislib_spark.decomposition.pca import PCA
from dislib_spark.array.linalg import qr_economic, svd

__all__ = ["PCA", "qr_economic", "svd"]
