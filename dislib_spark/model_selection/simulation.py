"""SimulationGridSearch — distributed black-box parameter sweeps.

Reference: ``dislib/model_selection/_simulation.py:1-213`` (exhaustive
execution of every param combination through a user-supplied
*simulation callable*, ``sim_number`` repeats each, ranked results)
and ``_validation.py:41-54`` (``simulation_execution``).

Spark-first design: a parameter sweep over an opaque Python callable
is the one workload where the RDD API is the right tool — there is no
columnar structure for Catalyst to optimize, just (candidate, repeat)
tasks to schedule. ``sparkContext.parallelize(tasks).map(run)`` gives
cluster-wide fan-out with speculative retry for free; results
(n_candidates x sim_number floats) are tiny and come back to the
driver, exactly like the reference's ``compss_wait_on``.

The result surface mirrors the reference byte-for-byte where numpy
allows: ``cv_results_`` with ``param_*`` masked arrays,
``results_{i}_test_simulation`` per-repeat columns,
``mean/std/rank_test_simulation`` (rank ``method='min'``), plus
``best_index_/best_score_/best_params_`` and ``raw_results``.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import numpy as np
from pyspark.sql import SparkSession


def _rank_min(means: np.ndarray, order: str) -> np.ndarray:
    """scipy.stats.rankdata(method='min') without scipy: rank = 1 +
    count of strictly-better candidates (ties share the min rank).
    ``order='max'`` ranks the highest mean first (reference
    _simulation.py:190-196)."""
    keyed = -means if order == "max" else means
    return np.array(
        [1 + int(np.sum(keyed < keyed[i])) for i in range(len(keyed))],
        dtype=np.int32,
    )


class SimulationGridSearch:
    """Exhaustive parallel sweep of a simulation callable over a
    parameter grid (reference _simulation.py:11-120).

    Parameters mirror the reference: ``estimator`` is a *callable*
    (raises NotImplementedError otherwise, matching
    _simulation.py:151-155), ``param_grid`` is a dict of lists or a
    list of such dicts, ``sim_number`` repeats each combination,
    ``order`` is "max" (rank highest first) or "min".
    """

    def __init__(self, estimator, param_grid, sim_number: int = 1,
                 order: str = "max"):
        if order not in ("max", "min"):
            raise ValueError("order must be 'max' or 'min'")
        self.estimator = estimator
        self.param_grid = param_grid
        self.sim_number = int(sim_number)
        self.order = order
        self.raw_results = None
        self.cv_results_ = None
        self.best_index_ = None
        self.best_score_ = None
        self.best_params_ = None

    def _candidates(self) -> list[dict]:
        grids = (
            self.param_grid
            if isinstance(self.param_grid, (list, tuple))
            else [self.param_grid]
        )
        out: list[dict] = []
        for grid in grids:
            keys = sorted(grid)
            for combo in itertools.product(*[grid[k] for k in keys]):
                out.append(dict(zip(keys, combo)))
        return out

    def fit(self, x=None, y=None, spark: SparkSession | None = None,
            **fit_params) -> "SimulationGridSearch":
        """Run every (candidate, repeat) simulation as one Spark job.

        ``x``/``y`` are accepted for reference signature parity and
        forwarded to nothing (the reference forwards only
        ``fit_params`` into the simulation, _validation.py:48-54).
        """
        if not callable(self.estimator):
            raise NotImplementedError(
                "The simulation needs to be contained on a function"
            )
        spark = spark or SparkSession.getActiveSession()
        candidates = self._candidates()
        sim, extra = self.estimator, dict(fit_params)

        tasks = [
            (ci, params)
            for ci, params in enumerate(candidates)
            for _ in range(self.sim_number)
        ]

        def run(task):
            ci, params = task
            return ci, sim(**params, **extra)

        # One flat RDD job: Spark schedules (candidate x repeat) tasks
        # across every executor; numSlices caps driver-side chunking.
        slices = max(1, min(len(tasks), spark.sparkContext.defaultParallelism))
        scored = (
            spark.sparkContext.parallelize(tasks, numSlices=slices)
            .map(run)
            .collect()
        )
        per_cand: list[list] = [[] for _ in candidates]
        for ci, value in scored:
            per_cand[ci].append(value)

        self.raw_results = per_cand
        results = self._format_results(candidates, per_cand)
        self.best_index_ = int(results["rank_test_simulation"].argmin())
        self.best_score_ = float(
            results["mean_test_simulation"][self.best_index_]
        )
        self.best_params_ = results["params"][self.best_index_]
        self.cv_results_ = results
        return self

    def _format_results(self, candidates: list[dict],
                        per_cand: list[list]) -> dict:
        n = len(candidates)
        arr = np.array(per_cand, dtype=np.float64).reshape(n, self.sim_number)
        results: dict = {}
        for i in range(self.sim_number):
            results[f"results_{i}_test_simulation"] = arr[:, i]
        means = arr.mean(axis=1)
        results["mean_test_simulation"] = means
        results["std_test_simulation"] = arr.std(axis=1)
        results["rank_test_simulation"] = _rank_min(means, self.order)

        param_results: dict = defaultdict(
            lambda: np.ma.MaskedArray(
                np.empty(n, dtype=object), mask=True, dtype=object
            )
        )
        for ci, params in enumerate(candidates):
            for name, value in params.items():
                param_results[f"param_{name}"][ci] = value
        results.update(param_results)
        results["params"] = candidates
        return results
