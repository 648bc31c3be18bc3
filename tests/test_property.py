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


words_st = st.lists(
    st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
    min_size=12,
    max_size=30,
)


@given(a=words_st, b=words_st, seed=st.integers(0, 10**6))
@settings(**_SETTINGS)
def test_winnow_shared_substring_guarantee(spark, a, b, seed):
    """The winnowing guarantee: two documents sharing a substring of
    length >= k + w - 1 share at least one fingerprint. Plant a long
    common run into both random docs and assert overlap."""
    from dislib_spark.text.winnow import with_fingerprints

    k, w = 8, 4
    common = "sharedrunsharedrunsharedrun"  # 27 chars >= k + w - 1
    ta = " ".join(a) + " " + common
    tb = common + " " + " ".join(b)
    df = spark.createDataFrame(
        [(1, ta), (2, tb)], "doc_id long, text string"
    )
    fps = {
        r.doc_id: set(r.fingerprints)
        for r in with_fingerprints(df, k=k, w=w).collect()
    }
    assert fps[1] & fps[2]


@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=50, unique=True),
    extra=st.lists(st.integers(0, 10**9), min_size=1, max_size=50, unique=True),
)
@settings(**_SETTINGS)
def test_bloom_no_false_negatives(spark, keys, extra):
    """Every inserted key passes the membership test (bloom contract:
    false positives allowed, false negatives never)."""
    from pyspark.sql import functions as F

    from dislib_spark.sketches import bloom_build, bloom_prefilter

    build = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = bloom_build(build, "k", n_bits=1 << 12)
    probe = spark.createDataFrame(
        [(k,) for k in set(keys) | set(extra)], "k long"
    )
    kept = {r.k for r in bloom_prefilter(probe, "k", bloom).collect()}
    assert set(keys) <= kept


@given(
    text=st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
            max_codepoint=0x7F,
        ),
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_pii_redaction_idempotent(spark, text):
    """redact(redact(x)) == redact(x): the mask token matches no
    pattern, so a second pass never changes the output."""
    from pyspark.sql import functions as F

    from dislib_spark.text.pii import redact

    df = spark.createDataFrame([(text,)], "text string")
    once = df.select(redact(F.col("text")).alias("r"))
    twice = once.select(F.col("r").alias("text")).select(
        redact(F.col("text")).alias("r")
    )
    assert once.collect() == twice.collect()


@st.composite
def event_stream(draw):
    """Random (key, epoch-second, value) ticks with duplicate-second
    collisions likely (small second range)."""
    n = draw(st.integers(min_value=2, max_value=25))
    secs = draw(
        st.lists(
            st.integers(min_value=0, max_value=7200),
            min_size=n, max_size=n,
        )
    )
    keys = draw(
        st.lists(
            st.integers(min_value=0, max_value=2), min_size=n, max_size=n
        )
    )
    vals = draw(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=n, max_size=n,
        )
    )
    return list(zip(keys, secs, vals))


@given(rows=event_stream(), gap_s=st.integers(min_value=60, max_value=1800))
@settings(**_SETTINGS)
def test_sessionize_matches_python_brute_force(spark, rows, gap_s):
    """Session assignment equals the obvious sequential python scan
    for any tick pattern (ties, bursts, lone events)."""
    import datetime as dt

    from dislib_spark.temporal import sessionize

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(seconds=s), v)
            for i, (k, s, v) in enumerate(rows)
        ],
        "eid long, k long, t timestamp, v double",
    )
    got = {
        r["eid"]: r["session_id"]
        for r in sessionize(
            df, "k", "t", f"{gap_s} seconds", tiebreak="eid"
        ).collect()
    }
    expect = {}
    for k in {r[0] for r in rows}:
        ticks = sorted(
            (s, i) for i, (kk, s, _) in enumerate(rows) if kk == k
        )
        sid, prev = 0, None
        for s, i in ticks:
            if prev is None or s - prev > gap_s:
                sid += 1
            expect[i] = sid
            prev = s
    assert got == expect


@given(rows=event_stream())
@settings(**_SETTINGS)
def test_twap_matches_python_brute_force(spark, rows):
    """TWAP equals the sequential duration-weighted mean per (key,
    day-bucket) for any tick pattern (all seconds < 2h → one bucket)."""
    import datetime as dt
    import math

    from dislib_spark.temporal import twap

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(seconds=s), v)
            for i, (k, s, v) in enumerate(rows)
        ],
        "eid long, k long, t timestamp, v double",
    )
    got = {
        r["k"]: (r["twap"], r["span_s"], r["n_obs"])
        for r in twap(
            df, "k", "t", "v", bucket="day", tiebreak="eid"
        ).collect()
    }
    for k in {r[0] for r in rows}:
        ticks = sorted(
            (s, i, v) for i, (kk, s, v) in enumerate(rows) if kk == k
        )
        num = den = 0.0
        for (s0, _, v0), (s1, _, _) in zip(ticks, ticks[1:]):
            num += v0 * (s1 - s0)
            den += s1 - s0
        if den == 0:
            # every tick simultaneous or single tick → no weighted row
            assert k not in got or got[k][1] == 0 or k not in got
            continue
        assert math.isclose(got[k][0], round(num / den, 6), abs_tol=2e-6)
        assert got[k][1] == int(den)


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=20,
        max_size=400,
    ),
    k=st.integers(min_value=2, max_value=16),
    shards=st.integers(min_value=1, max_value=8),
    q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
)
@settings(**_SETTINGS)
def test_stride_quantiles_bound_property(spark, vals, k, shards, q):
    """The x82 contract must hold on ARBITRARY integer multisets and
    (k, shards) configs, not just the fixtures: fewer than
    ceil(q*n) elements lie strictly below the estimate, and at least
    ceil(q*n) - bound lie at or below it."""
    import math

    from pyspark.sql import functions as F

    from dislib_spark.sketches import stride_quantiles

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    ).repartition(3)
    row = stride_quantiles(
        df, "v", F.col("id"), qs=(q,), k=k, shards=shards
    ).collect()[0]
    n, est, bound = row["n"], row["est"], row["rank_err_bound"]
    assert n == len(vals)
    t = math.ceil(q * n)
    svals = sorted(float(v) for v in vals)
    lt = sum(1 for v in svals if v < est)
    le = sum(1 for v in svals if v <= est)
    assert lt < t, (lt, t, est)
    assert le >= t - bound, (le, t, bound, est)
