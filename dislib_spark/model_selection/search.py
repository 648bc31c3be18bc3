"""Hyperparameter search.

Reference: ``dislib/model_selection/_search.py:20-680`` — GridSearchCV
/ RandomizedSearchCV dispatch all (candidate × fold) fits as one
concurrent task graph, then rank synced scores.

Spark-first: fits run sequentially per candidate (each fit is itself
fully distributed, which is where the parallelism belongs at scale);
the cv folds reuse one cached input. MLlib's CrossValidator offers
``parallelism=`` when concurrent small fits matter — our estimators
keep the sklearn-style contract, so the loop lives here.
"""

from __future__ import annotations

import itertools
from typing import Any

import numpy as np

from dislib_spark.array.core import DsArray
from dislib_spark.model_selection.split import KFold


class GridSearchCV:
    """reference _search.py:287-472."""

    def __init__(
        self,
        estimator_factory,
        param_grid: dict[str, list[Any]],
        cv: int = 5,
        scoring=None,
        refit: bool = True,
    ):
        self.estimator_factory = estimator_factory
        self.param_grid = param_grid
        self.cv = cv
        self.scoring = scoring
        self.refit = refit
        self.cv_results_: dict | None = None
        self.best_params_: dict | None = None
        self.best_score_: float | None = None
        self.best_estimator_ = None

    def _candidates(self):
        keys = sorted(self.param_grid)
        for combo in itertools.product(*[self.param_grid[k] for k in keys]):
            yield dict(zip(keys, combo))

    def fit(self, x: DsArray, y: DsArray | None = None) -> "GridSearchCV":
        kf = KFold(n_splits=self.cv)
        results: list[tuple[dict, float]] = []
        for params in self._candidates():
            scores = []
            for split in kf.split(x, y):
                if y is None:
                    x_train, x_test = split
                    est = self.estimator_factory(**params)
                    est.fit(x_train)
                    s = (
                        self.scoring(est, x_test, None)
                        if self.scoring
                        else est.score(x_test)
                    )
                else:
                    (x_train, y_train), (x_test, y_test) = split
                    est = self.estimator_factory(**params)
                    est.fit(x_train, y_train)
                    s = (
                        self.scoring(est, x_test, y_test)
                        if self.scoring
                        else est.score(x_test, y_test)
                    )
                scores.append(float(s))
            results.append((params, float(np.mean(scores))))

        self.cv_results_ = {
            "params": [r[0] for r in results],
            "mean_test_score": [r[1] for r in results],
        }
        best = max(range(len(results)), key=lambda i: results[i][1])
        self.best_params_, self.best_score_ = results[best]
        if self.refit:
            est = self.estimator_factory(**self.best_params_)
            est.fit(x, y) if y is not None else est.fit(x)
            self.best_estimator_ = est
        return self


class RandomizedSearchCV(GridSearchCV):
    """reference _search.py:474-680: sample n_iter param combos from
    lists/distributions (objects with ``rvs``)."""

    def __init__(
        self,
        estimator_factory,
        param_distributions: dict[str, Any],
        n_iter: int = 10,
        cv: int = 5,
        scoring=None,
        refit: bool = True,
        random_state: int = 0,
    ):
        super().__init__(estimator_factory, {}, cv, scoring, refit)
        self.param_distributions = param_distributions
        self.n_iter = n_iter
        self.random_state = random_state

    def _candidates(self):
        rng = np.random.RandomState(self.random_state)
        keys = sorted(self.param_distributions)
        for _ in range(self.n_iter):
            params = {}
            for k in keys:
                v = self.param_distributions[k]
                if hasattr(v, "rvs"):
                    params[k] = v.rvs(random_state=rng)
                else:
                    params[k] = v[rng.randint(len(v))]
            yield params
