from dislib_spark.model_selection.split import KFold, train_test_split
from dislib_spark.model_selection.search import GridSearchCV, RandomizedSearchCV
from dislib_spark.model_selection.simulation import SimulationGridSearch

__all__ = [
    "KFold",
    "train_test_split",
    "GridSearchCV",
    "RandomizedSearchCV",
    "SimulationGridSearch",
]
