from dislib_spark.utils.base import shuffle, to_ml_df, prediction_to_dsarray

__all__ = ["shuffle", "to_ml_df", "prediction_to_dsarray"]
