from dislib_spark.array.linalg import kron, svd

__all__ = ["kron", "svd"]
