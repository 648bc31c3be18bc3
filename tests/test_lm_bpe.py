"""Unigram-LM scoring + BPE kernels vs pure-python references."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from dislib_spark.text.lm import bpe_pair_counts, bpe_train, lm_doc_scores

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "low lower lowest low"),
    (3, "zebra"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lm_scores_match_python(spark, docs):
    toks = {i: t.split(" ") for i, t in DOCS}
    counts = Counter(w for ws in toks.values() for w in ws)
    total = sum(counts.values())
    want = {
        i: sum(math.log(counts[w] / total) for w in ws) / len(ws)
        for i, ws in toks.items()
    }
    got = {r["doc_id"]: r["lm_score"] for r in lm_doc_scores(docs).collect()}
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)
    # rarest-token doc is the most surprising
    assert min(got, key=got.get) == 3


def test_bpe_pair_counts_match_python(spark, docs):
    words = Counter(w for _, t in DOCS for w in t.split(" "))
    want: Counter = Counter()
    for w, freq in words.items():
        for i in range(len(w) - 1):
            want[w[i : i + 2]] += freq
    got = {r["pair"]: r["total"] for r in bpe_pair_counts(docs).collect()}
    assert got == {p: c for p, c in want.items()}


def test_bpe_train_matches_python(spark, docs):
    def py_bpe(n):
        vocab = Counter()
        for _, t in DOCS:
            for w in t.split(" "):
                vocab[tuple(w)] += 1
        merges = []
        for _ in range(n):
            counts = Counter()
            for syms, freq in vocab.items():
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] += freq
            if not counts:
                break
            (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((a + b, c))
            new_vocab = Counter()
            for syms, freq in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[tuple(out)] += freq
            vocab = new_vocab
        return merges

    assert bpe_train(docs, n_merges=6) == py_bpe(6)


def test_bpe_single_char_words_only(spark):
    df = spark.createDataFrame([(0, "a b a")], "doc_id long, text string")
    assert bpe_pair_counts(df).collect() == []


def test_bpe_encode_matches_python(spark):
    texts = {1: "low lower lowest", 2: "new newer newest low", 3: "wide wider low new"}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    from dislib_spark.text.lm import bpe_encode, bpe_train

    merges = bpe_train(df, n_merges=5, return_pairs=True)
    assert all(isinstance(m, tuple) and len(m) == 2 for m in merges)

    def py_encode(w):
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return len(syms)

    got = {r["doc_id"]: (r["n_subtokens"], r["n_words"]) for r in bpe_encode(df, merges).collect()}
    for i, t in texts.items():
        words = t.split(" ")
        assert got[i] == (sum(py_encode(w) for w in words), len(words))
