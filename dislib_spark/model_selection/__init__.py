from dislib_spark.model_selection.split import KFold, train_test_split
from dislib_spark.model_selection.search import GridSearchCV, RandomizedSearchCV

__all__ = ["KFold", "train_test_split", "GridSearchCV", "RandomizedSearchCV"]
