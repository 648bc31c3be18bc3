"""Semantic dedup (SemDeDup-style) — numpy parity + plan shape."""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pytest
from pyspark.sql import functions as F

from dislib_spark.vector.semantic import (
    assign_clusters,
    semantic_dedup_keep,
    semantic_dedup_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _np_reference(emb_df, n_clusters=4, threshold=0.3):
    rows = sorted(
        ((r["vec_id"], np.asarray(r["embedding"], dtype=np.float64)) for r in emb_df.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    centers = Xn[: n_clusters]  # seed centroids = first k vectors
    sims = Xn @ centers.T
    clusters = sims.argmax(axis=1)  # numpy argmax ties → lowest index
    pairs = set()
    for c in range(n_clusters):
        members = np.where(clusters == c)[0]
        for ii, i in enumerate(members):
            for j in members[ii + 1 :]:
                if round(float(Xn[i] @ Xn[j]), 6) >= threshold:
                    pairs.add((int(ids[i]), int(ids[j])))
    return clusters, ids, pairs


def test_pairs_match_numpy(spark, emb):
    clusters, ids, want = _np_reference(emb)
    got = {
        (r["a_id"], r["b_id"])
        for r in semantic_dedup_pairs(emb, n_clusters=4, threshold=0.3).collect()
    }
    assert got == want


def test_assignment_matches_numpy(spark, emb):
    clusters, ids, _ = _np_reference(emb)
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, n_clusters=4).collect()
    }
    want = {int(i): int(c) for i, c in zip(ids, clusters)}
    assert got == want


def test_keep_set_complements_drops(spark, emb):
    pairs = semantic_dedup_pairs(emb, n_clusters=4, threshold=0.3)
    drops = {r["b_id"] for r in pairs.collect()}
    keep = {r["vec_id"] for r in semantic_dedup_keep(emb, n_clusters=4, threshold=0.3).collect()}
    allids = {r["vec_id"] for r in emb.collect()}
    assert keep == allids - drops
    # every survivor pair either spans clusters or is below threshold
    assert keep | drops == allids


def test_kmeans_mode_runs(spark, emb):
    out = semantic_dedup_pairs(
        emb, n_clusters=4, threshold=0.3, centers="kmeans"
    )
    rows = out.collect()
    assert all(r["sim"] >= 0.3 for r in rows)
    assert all(r["a_id"] < r["b_id"] for r in rows)


def test_assignment_plan_no_shuffle(spark, emb):
    """Literal-center assignment must be a narrow map: no Exchange,
    no Python eval."""
    df = assign_clusters(emb, n_clusters=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_arrow_assignment_matches_literal(spark, emb):
    from dislib_spark.vector.semantic import assign_clusters

    lit = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, n_clusters=4, method="literal").collect()
    }
    arw = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, n_clusters=4, method="arrow").collect()
    }
    assert lit == arw


def test_recall_tradeoff_vs_exact(spark, emb):
    """SemDeDup honesty gate: within-cluster search returns a SUBSET
    of the true cosine>=t pairs (precision 1.0 by construction —
    pairs are exact-cosine verified) and recall decreases as clusters
    shrink the candidate space. On this near-uniform synthetic
    fixture the trade is harsh (measured: k=2 -> 0.62, k=4 -> 0.38);
    real semantically-clustered corpora co-locate their near-dups."""
    rows = sorted(
        ((r["vec_id"], np.asarray(r["embedding"], dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    true_pairs = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(float(S[i, j]), 6) >= 0.3
    }
    recalls = []
    for k in (2, 4):
        got = {
            (r["a_id"], r["b_id"])
            for r in semantic_dedup_pairs(emb, n_clusters=k, threshold=0.3).collect()
        }
        assert got <= true_pairs  # precision 1.0
        recalls.append(len(got) / len(true_pairs))
    assert recalls[0] >= recalls[1]  # coarser cells keep more pairs
    assert recalls[1] >= 0.3  # measured floor on this fixture


def test_arrow_pairs_match_sql(spark, emb):
    sql_pairs = {
        (r["cluster"], r["a_id"], r["b_id"], r["sim"])
        for r in semantic_dedup_pairs(
            emb, n_clusters=4, threshold=0.3, pairs_method="sql"
        ).collect()
    }
    arrow_pairs = {
        (r["cluster"], r["a_id"], r["b_id"], r["sim"])
        for r in semantic_dedup_pairs(
            emb, n_clusters=4, threshold=0.3, pairs_method="arrow"
        ).collect()
    }
    # id sets must agree exactly; sims agree to fp rounding
    assert {(c, a, b) for c, a, b, _ in sql_pairs} == {
        (c, a, b) for c, a, b, _ in arrow_pairs
    }
    sq = {(c, a, b): s for c, a, b, s in sql_pairs}
    for (c, a, b), s in (
        ((c, a, b), s) for c, a, b, s in arrow_pairs
    ):
        assert abs(sq[(c, a, b)] - s) <= 1e-6
