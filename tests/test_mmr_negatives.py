"""MMR re-rank exact-greedy parity and hard-negative contract tests.

The distributed MMR path (candidate fan-out + per-query Arrow greedy)
must reproduce a straight-line python greedy on the collected
candidates bit-for-bit; hard negatives must exclude the query's own
label and rank by the same rounded cosine as the exact top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.tables import load_table
from dislib_spark.vector.search import cosine_topk, hard_negatives, mmr_rerank

SF = "/root/testdata/sf0.001"


def _reference_mmr(cands, k, lam):
    """Straight-line greedy over one query's candidate list.

    cands: list of (c_id, sim, vec) sorted any order.
    """
    cands = sorted(cands, key=lambda t: (-t[1], t[0]))
    vecs = np.asarray([np.asarray(c[2], dtype=np.float64) for c in cands])
    nrm = np.linalg.norm(vecs, axis=1)
    nrm[nrm == 0.0] = 1.0
    unit = vecs / nrm[:, None]
    chosen, scores = [], []
    remaining = list(range(len(cands)))
    while remaining and len(chosen) < k:
        if not chosen:
            best_i, best_s = remaining[0], cands[remaining[0]][1]
        else:
            sel = unit[chosen]
            best_i, best_s = -1, -np.inf
            for i in remaining:
                red = float(np.max(sel @ unit[i]))
                s = lam * cands[i][1] - (1.0 - lam) * red
                if s > best_s or (
                    s == best_s and cands[i][0] < cands[best_i][0]
                ):
                    best_i, best_s = i, s
        chosen.append(best_i)
        scores.append(float(best_s))
        remaining.remove(best_i)
    return [
        (cands[i][0], round(s, 6), r + 1)
        for r, (i, s) in enumerate(zip(chosen, scores))
    ]


def test_mmr_matches_straightline_greedy(spark):
    e = load_table(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") < 3)
    got = (
        mmr_rerank(q, e, k=10, fetch_k=50, lam=0.7)
        .orderBy("q_id", "rank")
        .collect()
    )
    # rebuild the candidate lists the distributed path saw
    cand = (
        cosine_topk(q, e, k=50)
        .join(
            e.select(
                F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("c_vec"),
            ),
            "c_id",
        )
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in cand:
        by_q.setdefault(r.q_id, []).append((r.c_id, r.sim, r.c_vec))
    assert len(got) == 3 * 10
    for q_id, rows in by_q.items():
        want = _reference_mmr(rows, k=10, lam=0.7)
        have = [
            (r.c_id, r.mmr_score, r.rank) for r in got if r.q_id == q_id
        ]
        assert have == want, f"q_id={q_id}"


def test_mmr_diversifies_vs_plain_topk(spark):
    """MMR must keep the top-1 (pure relevance) and may only reorder /
    swap later picks; the selected set is a subset of the fetch pool."""
    e = load_table(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") == 0)
    plain = cosine_topk(q, e, k=50).collect()
    mmr = mmr_rerank(q, e, k=10, fetch_k=50, lam=0.7).collect()
    pool = {r.c_id for r in plain}
    top1 = max(plain, key=lambda r: (r.sim, -r.c_id)).c_id
    assert [r.c_id for r in mmr if r.rank == 1] == [top1]
    assert {r.c_id for r in mmr} <= pool


def test_hard_negatives_exclude_query_label(spark):
    e = load_table(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    labels = {r.vec_id: r.label for r in q.select("vec_id", "label").collect()}
    out = hard_negatives(q, e, k=10).collect()
    assert len(out) == 5 * 10
    corpus_labels = {
        r.vec_id: r.label for r in e.select("vec_id", "label").collect()
    }
    for r in out:
        assert r.q_label == labels[r.q_id]
        assert corpus_labels[r.c_id] != r.q_label
    # per query: sims non-increasing with rank
    for qid in labels:
        sims = [r.sim for r in sorted(
            (x for x in out if x.q_id == qid), key=lambda x: x.rank
        )]
        assert sims == sorted(sims, reverse=True)
