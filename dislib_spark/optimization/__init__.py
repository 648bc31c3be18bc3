from dislib_spark.optimization.admm import ADMM, soft_threshold

__all__ = ["ADMM", "soft_threshold"]
