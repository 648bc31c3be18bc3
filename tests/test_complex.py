"""ComplexDsArray vs numpy complex128 (reference array.py:1219-1226
exercises conj; here the whole complex surface is oracle-checked
against numpy)."""

from __future__ import annotations

import numpy as np
import pytest

import dislib_spark as ds
from dislib_spark.array import complexa

RNG = np.random.RandomState(11)


@pytest.fixture(scope="module")
def cmats(spark):
    A = RNG.rand(13, 5) + 1j * RNG.rand(13, 5)
    B = RNG.rand(13, 5) + 1j * RNG.rand(13, 5)
    return A, B, ds.carray(A, spark), ds.carray(B, spark)


def test_roundtrip_and_parts(spark, cmats):
    A, _, dA, _ = cmats
    got = dA.collect()
    assert got.dtype == np.complex128
    np.testing.assert_allclose(got, A)
    np.testing.assert_allclose(dA.real.collect(), A.real)
    np.testing.assert_allclose(dA.imag.collect(), A.imag)


def test_conj(spark, cmats):
    A, _, dA, _ = cmats
    np.testing.assert_allclose(dA.conj().collect(), np.conj(A))
    # conj is an involution
    np.testing.assert_allclose(dA.conj().conj().collect(), A)


def test_arithmetic(spark, cmats):
    A, B, dA, dB = cmats
    np.testing.assert_allclose((dA + dB).collect(), A + B)
    np.testing.assert_allclose((dA - dB).collect(), A - B)
    np.testing.assert_allclose((dA * dB).collect(), A * B)
    z = 2.5 - 1.5j
    np.testing.assert_allclose((dA * z).collect(), A * z)
    np.testing.assert_allclose((dA + z).collect(), A + z)
    np.testing.assert_allclose((-dA).collect(), -A)
    np.testing.assert_allclose(dA.abs().collect(), np.abs(A))


def test_transpose_hermitian(spark, cmats):
    A, _, dA, _ = cmats
    np.testing.assert_allclose(dA.T.collect(), A.T)
    np.testing.assert_allclose(dA.hermitian().collect(), A.conj().T)


def test_complex_matmul(spark):
    A = RNG.rand(9, 4) + 1j * RNG.rand(9, 4)
    B = RNG.rand(4, 6) + 1j * RNG.rand(4, 6)
    dA, dB = ds.carray(A, spark), ds.carray(B, spark)
    got = (dA @ dB).collect()
    np.testing.assert_allclose(got, A @ B, atol=1e-10)


def test_lift_real(spark):
    R = RNG.rand(6, 3)
    dC = complexa.from_real(ds.array(R, spark))
    got = dC.collect()
    np.testing.assert_allclose(got.real, R)
    np.testing.assert_allclose(got.imag, 0.0)


def test_no_python_in_conj_plan(spark, cmats):
    """conj/arithmetic stay JVM-side: no BatchEvalPython stages."""
    import contextlib
    import io

    _, _, dA, dB = cmats
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        (dA.conj() * dB).df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
