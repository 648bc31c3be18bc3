"""Chunking + edit-distance dedup vs pure-python references."""

from __future__ import annotations

import hashlib

import pytest

from dislib_spark.text.chunking import chunk_documents, fuzzy_pairs

DOCS = [
    (0, " ".join(f"w{i}" for i in range(120))),
    (1, " ".join(f"w{i}" for i in range(50))),
    (2, " ".join(f"w{i}" for i in range(30))),   # shorter than a chunk
    (3, "single"),
    (4, " ".join(f"w{i}" for i in range(51))),   # one token past a chunk
]


def _py_chunks(text, c=50, o=10):
    toks = text.split(" ")
    step = c - o
    starts = list(range(1, max(len(toks) - o, 1) + 1, step))
    return [
        " ".join(toks[s - 1 : s - 1 + c]) for s in starts
    ]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_chunks_match_python(spark, docs):
    got = {}
    for r in chunk_documents(docs, 50, 10).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk"], r["n_tokens"], r["fp"])
        )
    for i, text in DOCS:
        want = _py_chunks(text)
        rows = sorted(got[i])
        assert len(rows) == len(want)
        for (cid, chunk, ntok, fp), w in zip(rows, want):
            assert chunk == w
            assert ntok == len(w.split(" "))
            assert fp == hashlib.md5(w.encode()).hexdigest()


def test_chunk_overlap_property(spark, docs):
    """Consecutive chunks share exactly `overlap` tokens (except a
    short final chunk)."""
    rows = [
        r
        for r in chunk_documents(docs, 50, 10).collect()
        if r["doc_id"] == 0
    ]
    rows.sort(key=lambda r: r["chunk_id"])
    a, b = rows[0]["chunk"].split(" "), rows[1]["chunk"].split(" ")
    assert a[-10:] == b[:10]


def test_overlap_validation(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, overlap=10)


def test_fuzzy_pairs_match_python(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delXa"),       # 1 edit from doc 0 prefix
        (2, "alpha beta totally different"),  # same bucket, far text
        (3, "omega psi chi"),                # different bucket
        (4, "alpha beta gamma delta"),       # exact dup of 0
    ]
    df = SparkDF = None
    import dislib_spark  # noqa: F401  (session already up via fixture)

    from pyspark.sql import SparkSession

    spark_ = SparkSession.getActiveSession()
    df = spark_.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_pairs(df, prefix_len=80, bucket_tokens=2, max_dist=5).collect()
    }
    # python reference
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    want = {}
    for (i, ta), (j, tb) in itertools.combinations(rows, 2):
        if ta.split(" ")[:2] == tb.split(" ")[:2]:
            d = lev(ta[:80], tb[:80])
            if d <= 5:
                want[(i, j)] = d
    assert got == want
    assert (0, 4) in got and got[(0, 4)] == 0
    assert (0, 1) in got and got[(0, 1)] == 1
    assert (0, 2) not in got


def test_inverted_index_matches_python(spark, docs):
    from dislib_spark.text.chunking import inverted_index

    want = {}
    for i, t in DOCS:
        for w in set(t.split(" ")):
            want.setdefault(w, []).append(i)
    want = {
        t: sorted(ids) for t, ids in want.items() if len(ids) >= 2 and t
    }
    got = {
        r["term"]: list(r["postings"])
        for r in inverted_index(docs, min_df=2).collect()
    }
    assert got == want


def test_triangle_count_matches_python(spark):
    from itertools import combinations

    from dislib_spark.graph import triangle_count

    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3), (4, 5), (0, 3)]
    es = set(edges)
    want = sum(
        1
        for a, b, c in combinations(range(6), 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    from pyspark.sql import SparkSession

    df = SparkSession.getActiveSession().createDataFrame(
        edges, "a_id long, b_id long"
    )
    row = triangle_count(df).collect()[0]
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == want == 4


def test_rechunk_and_load_blocks_rechunk(spark):
    """rechunk = value-identity repartition into contiguous row
    ranges (reference array.py:1228); load_blocks_rechunk assembles a
    row-major block grid then rechunks (reference data/io.py:405) —
    same ValueError contract for oversized blocks."""
    import numpy as np
    import pytest

    import dislib_spark as ds

    A = np.arange(48, dtype=float).reshape(12, 4)
    a = ds.array(A, spark)
    r = a.rechunk((5, 4))
    assert r.shape == (12, 4)
    assert np.allclose(r.collect(), A)
    assert r.df.rdd.getNumPartitions() == 3  # ceil(12/5) row blocks
    with pytest.raises(ValueError, match="greater than the ds-array"):
        a.rechunk((13, 4))

    # 2x2 grid of 3x2 blocks, row-major flat list
    blocks = [A[i : i + 3, j : j + 2] for i in (0, 3) for j in (0, 2)]
    got = ds.load_blocks_rechunk(
        blocks, shape=(6, 4), block_size=(3, 2), new_block_size=(2, 4),
        spark=spark,
    )
    assert got.shape == (6, 4)
    assert np.allclose(got.collect(), A[:6])
    assert got.df.rdd.getNumPartitions() == 3
    with pytest.raises(ValueError, match="greater than the ds-array"):
        ds.load_blocks_rechunk(
            blocks, (6, 4), (3, 2), (7, 4), spark=spark
        )


def test_load_blocks_rechunk_non_divisible_shape(spark):
    """A 5x4 array from a 3x2 grid of 2x2 blocks (last block row is
    1x2): ceil-division assembly keeps the trailing partial blocks —
    the floored grid would silently drop the fifth data row."""
    import numpy as np

    import dislib_spark as ds

    full = np.arange(20, dtype=float).reshape(5, 4)
    blocks = [
        full[i : i + 2, j : j + 2]
        for i in range(0, 5, 2)
        for j in range(0, 4, 2)
    ]
    got = ds.load_blocks_rechunk(
        blocks, shape=(5, 4), block_size=(2, 2), new_block_size=(3, 4),
        spark=spark,
    )
    assert got.shape == (5, 4)
    assert np.array_equal(got.collect(), full)


def test_subword_count_matches_python_chunker(spark):
    """SUBWORD_RE greedy chunking vs a direct python re.findall on
    mixed text — the t62 fertility numerator."""
    import re

    from pyspark.sql import functions as F

    from dislib_spark.text.analysis import SUBWORD_RE, subword_count

    texts = [
        "tokenization and 12345 rows!",
        "a bb ccc dddd eeeee ffffff",
        "x9y 1234 ...",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        r["c"]
        for r in df.select(
            subword_count(F.col("text")).alias("c")
        ).collect()
    ]
    want = [len(re.findall(SUBWORD_RE, t)) for t in texts]
    assert got == want
    # greedy chunk arithmetic: 6 letters -> 4+2 = 2 pieces
    assert want[1] == 1 + 1 + 1 + 1 + 2 + 2
