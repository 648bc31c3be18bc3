"""Duplicated-substring span detection vs a pure-python reference."""

from __future__ import annotations

import pytest

from dislib_spark.text.spans import duplicated_spans, span_stats


def _py_spans(texts: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    """Reference: brute-force k-gram blocking + island merge."""
    grams: dict[tuple, set[int]] = {}
    pos: dict[int, list[int]] = {}
    toks = {i: t.split(" ") for i, t in texts.items()}
    for i, ws in toks.items():
        for s in range(len(ws) - k + 1):
            grams.setdefault(tuple(ws[s : s + k]), set()).add(i)
    for i, ws in toks.items():
        hits = [
            s + 1
            for s in range(len(ws) - k + 1)
            if len(grams[tuple(ws[s : s + k])]) >= 2
        ]
        pos[i] = hits
    out = set()
    for i, hits in pos.items():
        run: list[int] = []
        for p in hits + [None]:
            if run and (p is None or p != run[-1] + 1):
                out.add((i, run[0], run[-1] + k - 1))
                run = []
            if p is not None:
                run.append(p)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    texts = {
        1: "a b c d e f g h i j unique1 x y",
        2: "zz a b c d e f g h i j other tail",
        3: "totally different words here nothing shared at all ok",
        4: "pre c d e f g h i j k l m post",  # overlaps 1/2 partially
        5: "short doc",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    return texts, df


def test_spans_match_python(spark, docs_df):
    texts, df = docs_df
    for k in (3, 5):
        got = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicated_spans(df, k=k).collect()
        }
        assert got == _py_spans(texts, k)


def test_span_stats(spark, docs_df):
    texts, df = docs_df
    ref = _py_spans(texts, 3)
    stats = {r["doc_id"]: r for r in span_stats(df, k=3).collect()}
    for i in {d for d, _, _ in ref}:
        spans = [(s, e) for d, s, e in ref if d == i]
        assert stats[i]["n_spans"] == len(spans)
        assert stats[i]["dup_tokens"] == sum(e - s + 1 for s, e in spans)
        assert stats[i]["max_span"] == max(e - s + 1 for s, e in spans)
    assert set(stats) == {d for d, _, _ in ref}


def test_short_docs_no_descending_sequence(spark):
    # sequence(1, n<1) is DESCENDING in Spark — the guard must yield
    # zero grams for docs shorter than k, not a [1,0] range.
    df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["doc_id", "text"])
    assert duplicated_spans(df, k=5).count() == 0
