"""MultinomialNB parity vs an independent numpy replay of the
sklearn.naive_bayes.MultinomialNB formulas (sklearn itself is not in
this container; the replay below IS the published definition:
feature_log_prob = ln((count(w,c)+α)/(count(c)+α·V)),
joint = log_prior + Σ tf·feature_log_prob).

The E2E confusion matrix is oracle-checked by the driver (m13);
this pins the estimator math on a controlled corpus. Out-of-vocab
behavior (tokens absent from training entirely) is exercised
separately: they score at the per-class smoothing floor.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

DOCS = [
    (0, "spark runs fast queries on big data", "tech"),
    (1, "the cat chased the small mouse", "pets"),
    (2, "distributed data shuffles join tables", "tech"),
    (3, "dogs and cats play in the garden", "pets"),
    (4, "query planner optimizes join order", "tech"),
    (5, "the small dog chased the ball", "pets"),
    (6, "columnar data scans prune partitions", "tech"),
]


def _py_nb(docs, alpha=1.0):
    """(joint[(doc_id, class)], pred[doc_id]) — multinomial NB with
    Lidstone smoothing, the sklearn formulas verbatim."""
    by_class_tokens: dict[str, Counter] = {}
    n_docs_c: Counter = Counter()
    vocab = set()
    for _id, text, c in docs:
        toks = [w for w in text.split(" ") if w]
        by_class_tokens.setdefault(c, Counter()).update(toks)
        n_docs_c[c] += 1
        vocab.update(toks)
    v = len(vocab)
    total = sum(n_docs_c.values())
    classes = sorted(n_docs_c)
    joint, pred = {}, {}
    for _id, text, _c in docs:
        toks = [w for w in text.split(" ") if w]
        best = None
        for c in classes:
            cc = by_class_tokens[c]
            n_c = sum(cc.values())
            j = math.log(n_docs_c[c] / total)
            for w in toks:
                j += math.log((cc[w] + alpha) / (n_c + alpha * v))
            joint[(_id, c)] = j
            if best is None or j > joint[(_id, best)]:
                best = c
        pred[_id] = best
    return joint, pred


def test_nb_joint_and_predictions_match_reference(spark):
    from dislib_spark.classification.naive_bayes import MultinomialNB

    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    nb = MultinomialNB(alpha=1.0).fit(df, label_col="lang")

    want_joint, want_pred = _py_nb(DOCS)
    got = {
        (r["doc_id"], r["c"]): r["joint"]
        for r in nb.score_documents(df).collect()
    }
    assert set(got) == set(want_joint)
    for k in want_joint:
        assert got[k] == pytest.approx(want_joint[k], abs=1e-9), k

    preds = {r["doc_id"]: r["pred"] for r in nb.predict(df).collect()}
    assert preds == want_pred
    # sanity: training accuracy is perfect on this separable corpus
    assert all(preds[i] == DOCS[i][2] for i in range(len(DOCS)))


def test_nb_unseen_tokens_hit_the_class_floor(spark):
    """A scoring doc whose tokens are ALL outside the training vocab
    gets exactly log_prior + dl * log_floor per class."""
    from dislib_spark.classification.naive_bayes import MultinomialNB

    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    nb = MultinomialNB(alpha=1.0).fit(df, label_col="lang")
    new = spark.createDataFrame(
        [(99, "zzz yyy xxx")], "doc_id long, text string"
    )
    stats = {
        r["c"]: (r["log_prior"], r["log_floor"])
        for r in nb.class_stats_.collect()
    }
    got = {
        r["c"]: r["joint"] for r in nb.score_documents(new).collect()
    }
    for c, (lp, lf) in stats.items():
        assert got[c] == pytest.approx(lp + 3 * lf, abs=1e-12)
