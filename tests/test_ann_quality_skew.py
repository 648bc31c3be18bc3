"""Quality gates for approximate paths (ANN recall vs exact) and
skew-mitigation helpers."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dislib_spark.tables import load_table
from dislib_spark.utils.skew import salted_agg, salted_join
from dislib_spark.vector.search import cosine_topk, ivf_topk, lsh_topk
from tests.conftest import SF_SMOKE


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["c_id"])
    return out


def test_lsh_and_ivf_recall(spark):
    """Approximate top-k must recover a reasonable fraction of the
    exact top-k on the real embeddings (recall gate — the scale paths
    must stay honest, not just run)."""
    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    exact = _topk_sets(cosine_topk(q, e, k=10))
    lsh = _topk_sets(lsh_topk(q, e, k=10, n_planes=6))
    ivf = _topk_sets(ivf_topk(q, e, k=10, n_cells=8, n_probe=4))

    def recall(approx):
        tot = hit = 0
        for qid, ex in exact.items():
            ap = approx.get(qid, set())
            hit += len(ex & ap)
            tot += len(ex)
        return hit / tot

    r_lsh, r_ivf = recall(lsh), recall(ivf)
    # self-match (rank 1) is always found; random 64-dim embeddings
    # are a worst case for locality — gates are intentionally loose
    # but nonzero beyond self-hits
    assert r_lsh > 0.15, f"LSH recall {r_lsh}"
    assert r_ivf > 0.4, f"IVF recall {r_ivf}"
    # every query answered
    assert set(exact) == set(lsh) == set(ivf)


def test_simhash_pairs_complete_vs_exact_hamming(spark):
    """Pigeonhole blocking is a GUARANTEE, not a heuristic: with
    max_hamming+1 blocks, simhash_pairs must return exactly the pairs
    a brute-force Hamming scan finds (the round-1 4-block version
    silently missed spread-diff pairs)."""
    from dislib_spark.text.dedup import simhash, simhash_pairs

    d = load_table(spark, SF_SMOKE, "documents")
    sigs = {
        r["id"]: r["sig"]
        for r in d.select(
            F.col("doc_id").alias("id"), simhash(F.col("text")).alias("sig")
        ).collect()
    }
    ids = sorted(sigs)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 8:
                want.add((a, b))
    got = {
        (r["a_id"], r["b_id"])
        for r in simhash_pairs(d, max_hamming=8).collect()
    }
    assert got == want, (
        f"missed={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )


def test_neardup_blockjoin_matches_bruteforce(spark):
    """The block-partitioned pair join must enumerate every unordered
    pair exactly once (same-block pairs pinned to their (p,p) bucket,
    cross-block to (lo,hi)) — compare against numpy all-pairs."""
    from dislib_spark.vector.search import neardup_pairs

    e = load_table(spark, SF_SMOKE, "embeddings").where(F.col("vec_id") < 150)
    rows = e.select("vec_id", "embedding").collect()
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(Vn @ Vn.T, 6)
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and S[i, j] >= 0.2:
                want.add((int(ids[i]), int(ids[j])))
    out = neardup_pairs(e, threshold=0.2, n_blocks=5).collect()
    got = [(r["a_id"], r["b_id"]) for r in out]
    assert len(got) == len(set(got)), "duplicate pairs from block join"
    assert set(got) == want


def test_neardup_lsh_recall_on_synthetic_dups(spark):
    """Banded-LSH near-dup candidates must recover ≥95% of true
    high-similarity pairs. The real embeddings have no high-sim pairs,
    so plant them: a jittered copy of each of 60 vectors."""
    from dislib_spark.vector.search import neardup_pairs, neardup_pairs_lsh

    e = load_table(spark, SF_SMOKE, "embeddings").where(F.col("vec_id") < 60)
    rows = e.select("vec_id", "embedding").collect()
    rng = np.random.RandomState(3)
    dup_rows = []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float32)
        v = v + rng.standard_normal(v.shape).astype(np.float32) * 0.05 * np.abs(v)
        dup_rows.append((int(r["vec_id"]) + 10_000, [float(x) for x in v]))
    dups = spark.createDataFrame(dup_rows, "vec_id long, embedding array<float>")
    both = e.select("vec_id", "embedding").unionByName(dups)

    exact = {
        (r["a_id"], r["b_id"])
        for r in neardup_pairs(both, threshold=0.9).collect()
    }
    approx = {
        (r["a_id"], r["b_id"])
        for r in neardup_pairs_lsh(both, threshold=0.9).collect()
    }
    assert len(exact) >= 50  # the planted dups are found by the exact path
    assert not (approx - exact), "LSH emitted a pair the exact path rejects"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.95, f"neardup LSH recall {recall}"


def test_minhash_hot_bucket_bounded_and_correct(spark):
    """One pathological duplicate-heavy bucket: 120 identical docs
    all but guarantee every band collides. Buckets must stay
    id-only/bounded and the pair output must still be the full
    duplicate clique; a small cap truncates deterministically without
    erroring."""
    from dislib_spark.text.dedup import minhash_lsh_pairs

    dup_text = "the same boilerplate text repeated in every document " * 3
    rows = [(i, dup_text) for i in range(120)]
    rows += [(1000 + i, f"unique document number {i} with words {i * 7} {i * 13}")
             for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = minhash_lsh_pairs(df, threshold=0.9).collect()
    got = {(r["a_id"], r["b_id"]) for r in out}
    want = {(a, b) for a in range(120) for b in range(120) if a < b}
    assert got == want

    capped = minhash_lsh_pairs(df, threshold=0.9, max_bucket_size=50).collect()
    capped_pairs = {(r["a_id"], r["b_id"]) for r in capped}
    # cap keeps the sorted-id prefix: the 50-doc clique survives
    assert {(a, b) for a in range(50) for b in range(50) if a < b} <= capped_pairs
    assert capped_pairs <= want


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["n"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["s"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("l_quantity", "count"), "s": ("l_quantity", "sum")},
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6


def test_salted_join_matches_broadcast(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(o, c, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted((r["c_mktsegment"], r["count"]) for r in plain) == sorted(
        (r["c_mktsegment"], r["count"]) for r in salted
    )


def test_pq_topk_recall(spark):
    """PQ-ADC + exact re-rank recall vs exact cosine top-k on the
    real embeddings table (same gate style as LSH/IVF)."""
    from pyspark.sql import functions as F

    from dislib_spark.tables import load_table
    from dislib_spark.vector.search import cosine_topk, pq_topk

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r.q_id, r.c_id)
        for r in cosine_topk(q, e, k=10).collect()
    }
    got = {
        (r.q_id, r.c_id)
        for r in pq_topk(q, e, k=10).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.85, recall


def test_jaccard_hot_shingle_posting_capped(spark):
    """One shingle present in EVERY doc (boilerplate header): without
    a posting cap the inverted index emits |corpus|^2 pairs from that
    single shingle. max_posting truncates the hot posting list to the
    smallest doc ids deterministically and bounds the pair count; docs
    sharing real content still pair via their other shingles."""
    from dislib_spark.text.dedup import jaccard_pairs

    boiler = "common header tokens"
    rows = [
        (i, f"{boiler} unique body {i * 7} {i * 13} {i * 19}")
        for i in range(200)
    ]
    # two genuinely similar docs (same body, different tail word)
    rows += [
        (900, f"{boiler} shared body text alpha beta gamma one"),
        (901, f"{boiler} shared body text alpha beta gamma two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = jaccard_pairs(df, threshold=0.4, max_posting=10).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in capped}
    # the pair explosion from hot shingles is bounded: every emitted
    # pair came from a <=10-doc posting, and the near-dup pair that
    # shares rare shingles survives the cap
    assert (900, 901) in pairs
    # hot-shingle-only pairs (unique bodies) never reach threshold
    assert all(a == 900 or a >= 0 for a, _ in pairs)
    only_common = {(a, b) for a, b in pairs if a < 900 and b < 900}
    assert only_common == set()

    # uncapped == capped here at threshold 0.4 (the cap only sheds
    # sub-threshold hot-shingle pairs), pinning value-identity
    uncapped = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in jaccard_pairs(df, threshold=0.4, max_posting=None).collect()
    }
    assert (900, 901) in {(a, b) for a, b, _ in uncapped}
    # truncation can only LOWER a pair's computed jaccard
    capped_vals = {(r["a_id"], r["b_id"]): r["jaccard"] for r in capped}
    unc_vals = {(a, b): j for a, b, j in uncapped}
    for k, j in capped_vals.items():
        assert j <= unc_vals[k] + 1e-9

    # max_df prune drops the boilerplate shingle entirely but keeps
    # the true near-dup pair alive through its rare shingles
    pruned = jaccard_pairs(
        df, threshold=0.4, max_posting=None, max_df=50
    ).collect()
    assert (900, 901) in {(r["a_id"], r["b_id"]) for r in pruned}


def test_ivfpq_recall_kmeans_mode(spark):
    """The composed IVF-PQ path (v31's kernel) on its PRODUCTION
    quantizers (MLlib KMeans cells + KMeans codebooks — the non-seed
    path no oracle covers): k rows per query, exact re-ranked sims
    match brute force on the intersection, and recall clears the IVF
    gate's floor (ADC shortlisting of cell-pruned candidates must not
    destroy what pruning alone preserves)."""
    from dislib_spark.vector.search import ivfpq_topk

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    exact = _topk_sets(cosine_topk(q, e, k=10))
    got = ivfpq_topk(
        q, e, k=10, n_cells=8, n_probe=4, n_subvectors=8,
        n_centroids=16, rerank=100,
    )
    rows = got.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    assert set(per_q) == set(exact)
    for qid, rs in per_q.items():
        assert len(rs) == 10
        assert sorted(r["rank"] for r in rs) == list(range(1, 11))
    # sims are EXACT cosine (re-rank contract): spot-check vs numpy
    vecs = {
        r["vec_id"]: np.asarray(list(r["embedding"]), dtype=float)
        for r in e.where(F.col("vec_id") < 400).collect()
    }
    for r in rows[:25]:
        if r["q_id"] in vecs and r["c_id"] in vecs:
            a, b = vecs[r["q_id"]], vecs[r["c_id"]]
            sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert abs(r["sim"] - round(sim, 6)) < 1e-6
    approx = _topk_sets(got)
    hit = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
    tot = sum(len(v) for v in exact.values())
    assert hit / tot > 0.4, f"IVF-PQ recall {hit / tot}"
