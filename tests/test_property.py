"""Property-based array-op tests (SURVEY.md §5.2 #4, mirroring the
reference's randomized _gen_random_arrays style,
tests/test_array.py:60-98). Few examples per property — each example
runs Spark jobs."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import dislib_spark as ds

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

shapes = st.tuples(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=8),
)


@st.composite
def matrix(draw):
    n, d = draw(shapes)
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).randn(n, d)


@given(A=matrix())
@settings(**_SETTINGS)
def test_roundtrip(spark, A):
    assert np.allclose(ds.array(A, spark).collect(), A)


@given(A=matrix(), s=st.floats(-10, 10, allow_nan=False))
@settings(**_SETTINGS)
def test_scalar_ops_commute(spark, A, s):
    a = ds.array(A, spark)
    assert np.allclose((a + s).collect(), A + s, atol=1e-12)
    assert np.allclose((a * s).collect(), A * s, atol=1e-12)


@given(A=matrix())
@settings(**_SETTINGS)
def test_transpose_involution(spark, A):
    a = ds.array(A, spark)
    assert np.allclose(a.T.T.collect(), A, atol=1e-12)


@given(A=matrix())
@settings(**_SETTINGS)
def test_reduction_consistency(spark, A):
    a = ds.array(A, spark)
    # sum over rows of col-sums == global sum
    assert np.isclose(
        a.sum(0).collect().sum(), A.sum(), atol=1e-9
    )
    assert np.allclose(a.mean(1).collect().ravel(), A.mean(1), atol=1e-9)


@given(A=matrix())
@settings(**_SETTINGS)
def test_concat_slicing_inverse(spark, A):
    n = A.shape[0]
    if n < 2:
        return
    a = ds.array(A, spark)
    cut = n // 2
    top, bottom = a[:cut], a[cut:]
    rejoined = ds.concat_rows(top, bottom)
    assert np.allclose(rejoined.collect(), A, atol=1e-12)
