from dislib_spark.classification.forest import (
    DecisionTreeClassifier,
    DecisionTreeRegressor,
    RandomForestClassifier,
    RandomForestRegressor,
)
from dislib_spark.classification.csvm import CascadeSVM, LinearSVC
from dislib_spark.classification.smo import SimpleSVC
from dislib_spark.classification.logistic import LogisticRegression
from dislib_spark.classification.naive_bayes import MultinomialNB
from dislib_spark.neighbors.knn import KNeighborsClassifier

__all__ = [
    "DecisionTreeClassifier", "DecisionTreeRegressor",
    "RandomForestClassifier", "RandomForestRegressor",
    "CascadeSVM", "LinearSVC", "SimpleSVC", "KNeighborsClassifier",
    "MultinomialNB", "LogisticRegression",
]
