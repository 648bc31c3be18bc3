from dislib_spark.sorting.terasort import TeraSort, terasort

__all__ = ["TeraSort", "terasort"]
