"""Library contracts for the round-4 additions: DSIR importance
weighting, reciprocal-rank fusion, and sorted-neighborhood dedup.

The E2E values are oracle-checked by the driver (t34/t35/v09); these
tests pin the library-level math against independent numpy/python
replays on controlled inputs.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

DOCS = [
    # (doc_id, text, lang, source)
    (0, "the cat sat on the mat", "en", "a"),
    (1, "the dog sat on the log", "en", "a"),
    (2, "der hund sitzt auf dem baumstamm", "de", "b"),
    (3, "le chat est sur le tapis", "fr", "b"),
    (4, "the cat and the dog", "en", "c"),
    (5, "der hund und die katze", "de", "c"),
]


def _py_dsir(docs, alpha=0.5):
    """Independent replay of the importance weight definition."""
    from collections import Counter

    raw, tgt = Counter(), Counter()
    for _id, text, lang, _src in docs:
        toks = [w for w in text.split(" ") if w]
        raw.update(toks)
        if lang == "en":
            tgt.update(toks)
    nr, nt, v = sum(raw.values()), sum(tgt.values()), len(raw)
    out = {}
    for _id, text, lang, _src in docs:
        toks = [w for w in text.split(" ") if w]
        s = 0.0
        for w in toks:
            s += math.log((tgt[w] + alpha) / (nt + alpha * v)) - math.log(
                (raw[w] + alpha) / (nr + alpha * v)
            )
        out[_id] = s / len(toks)
    return out


def test_dsir_importance_matches_python(spark):
    from dislib_spark.text.features import dsir_importance

    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )
    got = {
        r["doc_id"]: r["weight"]
        for r in dsir_importance(df, F.col("lang") == "en").collect()
    }
    want = _py_dsir(DOCS)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    # English docs must look more target-like than the non-English
    en = [want[i] for i in (0, 1, 4)]
    other = [want[i] for i in (2, 3, 5)]
    assert min(en) > max(other)


def test_rrf_fuse_exact_values(spark):
    from dislib_spark.vector.search import rrf_fuse

    l1 = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    l2 = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank int"
    )
    got = {
        r["doc_id"]: (r["rrf"], r["n_lists"])
        for r in rrf_fuse([l1, l2], k=60).collect()
    }
    assert got[11] == (round(1 / 62 + 1 / 61, 6), 2)
    assert got[10] == (round(1 / 61, 6), 1)
    assert got[12] == (round(1 / 63, 6), 1)
    assert got[13] == (round(1 / 62, 6), 1)
    # the doc present in both lists wins
    best = max(got, key=lambda d: got[d][0])
    assert best == 11


def _py_snm(docs, window=5, n=3):
    """Brute-force sorted-neighborhood replay: sort by first-3-token
    key, pair every two rows within `window` ranks, exact Jaccard on
    distinct word n-grams."""

    def sh(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    keyed = sorted(
        ((" ".join(t.split(" ")[:3]), i, sh(t)) for i, t, *_ in docs),
        key=lambda x: (x[0], x[1]),
    )
    pairs = {}
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + window, len(keyed))):
            a, b = keyed[i], keyed[j]
            inter = len(a[2] & b[2])
            jac = inter / (len(a[2] | b[2])) if (a[2] | b[2]) else 0.0
            pairs[(min(a[1], b[1]), max(a[1], b[1]))] = round(jac, 6)
    return pairs


def test_snm_pairs_matches_bruteforce_window(spark):
    from dislib_spark.text.dedup import snm_pairs

    near_dups = DOCS + [
        (6, "the cat sat on the mat today", "en", "d"),
        (7, "the cat sat on the mat today indeed", "en", "d"),
    ]
    df = spark.createDataFrame(
        near_dups, "doc_id long, text string, lang string, source string"
    )
    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in snm_pairs(df, window=5, threshold=0.0, n=3).collect()
    }
    want = {k: v for k, v in _py_snm(near_dups, window=5, n=3).items()}
    assert got == pytest.approx(want)
    # and the threshold actually filters
    thr = {
        (r["a_id"], r["b_id"])
        for r in snm_pairs(df, window=5, threshold=0.3, n=3).collect()
    }
    assert thr == {k for k, v in want.items() if v >= 0.3}
    assert (0, 6) in thr or (6, 7) in thr  # the planted near-dups pair up
