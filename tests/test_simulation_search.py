"""SimulationGridSearch vs the reference contract
(_simulation.py doc example + result-dict shape)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from dislib_spark.model_selection import SimulationGridSearch


def _make_simulation():
    # defined in a closure so cloudpickle ships it BY VALUE to the
    # executors (a module-level def in a test module is pickled by
    # reference and the executor can't import the test module)
    def my_simulation(a, b):
        # the reference's doc example (_simulation.py:43-45)
        return (a * a) / (b * b) + a * (a + b) - b * (2 * b)

    return my_simulation


my_simulation = _make_simulation()

GRID = {"a": [-1.1, -0.1, 1.5, 2.5], "b": [0.1, 1.5, 2.5, 3.5]}


def _local_best(order):
    combos = [
        dict(zip(sorted(GRID), c))
        for c in itertools.product(*[GRID[k] for k in sorted(GRID)])
    ]
    scores = [my_simulation(**p) for p in combos]
    pick = np.argmin(scores) if order == "min" else np.argmax(scores)
    return combos[pick], scores[pick]


@pytest.mark.parametrize("order", ["min", "max"])
def test_doc_example_best(spark, order):
    s = SimulationGridSearch(my_simulation, GRID, order=order)
    s.fit(None, spark=spark)
    want_params, want_score = _local_best(order)
    assert s.best_params_ == want_params
    assert s.best_score_ == pytest.approx(want_score)
    # rank 1 is the best candidate; ranks are 1-based ints
    assert s.cv_results_["rank_test_simulation"][s.best_index_] == 1


def test_result_dict_shape(spark):
    s = SimulationGridSearch(my_simulation, GRID, sim_number=3, order="max")
    s.fit(None, spark=spark)
    r = s.cv_results_
    n = 16
    for i in range(3):
        assert r[f"results_{i}_test_simulation"].shape == (n,)
    assert r["mean_test_simulation"].shape == (n,)
    # deterministic simulation → zero std across repeats
    np.testing.assert_allclose(r["std_test_simulation"], 0.0, atol=1e-9)
    assert isinstance(r["param_a"], np.ma.MaskedArray)
    assert list(r["param_a"][:4]) == [-1.1] * 4
    assert len(r["params"]) == n
    assert len(s.raw_results) == n and len(s.raw_results[0]) == 3


def test_list_of_grids_and_masking(spark):
    grids = [{"a": [1.0, 2.0], "b": [1.0]}, {"a": [3.0], "c": [7.0]}]

    def sim(a, b=0.0, c=0.0):
        return a + b + c

    s = SimulationGridSearch(sim, grids, order="max").fit(None, spark=spark)
    assert s.best_params_ == {"a": 3.0, "c": 7.0}
    # param_c is masked for candidates from the first grid
    assert bool(np.ma.getmaskarray(s.cv_results_["param_c"])[0])


def test_fit_params_forwarded(spark):
    def sim(a, scale):
        return a * scale

    s = SimulationGridSearch(sim, {"a": [1.0, 2.0]}, order="max")
    s.fit(None, spark=spark, scale=10.0)
    assert s.best_score_ == pytest.approx(20.0)


def test_non_callable_raises(spark):
    s = SimulationGridSearch(object(), {"a": [1]})
    with pytest.raises(NotImplementedError):
        s.fit(None, spark=spark)
