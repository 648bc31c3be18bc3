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
