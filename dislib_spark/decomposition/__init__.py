from dislib_spark.decomposition.pca import PCA
from dislib_spark.decomposition.qr import lanczos_svd, qr, random_svd, tsqr
from dislib_spark.array.linalg import qr_economic, svd

__all__ = ["PCA", "lanczos_svd", "qr", "qr_economic", "random_svd", "svd", "tsqr"]
