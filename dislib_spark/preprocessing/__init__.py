from dislib_spark.preprocessing.scalers import (
    MinMaxScaler,
    RobustScaler,
    StandardScaler,
    column_stats,
)

__all__ = ["MinMaxScaler", "RobustScaler", "StandardScaler", "column_stats"]
