from dislib_spark.recommendation.als import ALS

__all__ = ["ALS"]
