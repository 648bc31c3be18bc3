from dislib_spark.utils.base import shuffle, to_ml_df, prediction_to_dsarray
from dislib_spark.utils.model import load_model, save_model
from dislib_spark.utils.skew import salted_agg, salted_join

__all__ = [
    "shuffle", "to_ml_df", "prediction_to_dsarray",
    "load_model", "save_model", "salted_agg", "salted_join",
]
