from dislib_spark.preprocessing.scalers import MinMaxScaler, StandardScaler, column_stats

__all__ = ["MinMaxScaler", "StandardScaler", "column_stats"]
