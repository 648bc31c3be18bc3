"""Persistent IVF index (ivf_index / ivf_query_index /
assign_to_cells): stored-vs-in-memory equality, append currency, and
numpy assignment parity — the v10 gates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dislib_spark.tables import load_table
from dislib_spark.vector.search import (
    assign_to_cells,
    ivf_index,
    ivf_query_index,
    ivf_topk,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def _key_rows(df):
    return sorted(
        (r["q_id"], r["c_id"], r["rank"], r["sim"]) for r in df.collect()
    )


def test_stored_index_equals_in_memory(spark, emb, tmp_path_factory):
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    queries = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 10))
    centers, assigned = ivf_index(corpus, n_cells=8, seed=17)
    mem = ivf_query_index(queries, centers, assigned, k=5, n_probe=3)

    tmp = str(tmp_path_factory.mktemp("ivfidx"))
    assigned.write.partitionBy("cell").parquet(f"{tmp}/assignments")
    centers.write.parquet(f"{tmp}/centers")
    stored = ivf_query_index(
        queries,
        spark.read.parquet(f"{tmp}/centers"),
        spark.read.parquet(f"{tmp}/assignments"),
        k=5,
        n_probe=3,
    )
    assert _key_rows(stored) == _key_rows(mem)


def test_ivf_topk_is_index_composition(spark, emb):
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    queries = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 10))
    direct = ivf_topk(queries, corpus, k=5, n_cells=8, n_probe=3, seed=17)
    centers, assigned = ivf_index(corpus, n_cells=8, seed=17)
    composed = ivf_query_index(queries, centers, assigned, k=5, n_probe=3)
    assert _key_rows(direct) == _key_rows(composed)


def test_assign_to_cells_numpy_parity(spark, emb):
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 40))
    centers, _ = ivf_index(corpus, n_cells=8, seed=17)
    got = {
        r["c_id"]: r["cell"] for r in assign_to_cells(batch, centers).collect()
    }
    ctr = {r["cell"]: np.array(r["center"]) for r in centers.collect()}
    cells = sorted(ctr)
    cmat = np.stack([ctr[c] for c in cells])
    for r in batch.select("vec_id", "embedding").collect():
        v = np.array(r["embedding"], dtype=np.float64)
        d2 = ((cmat - v) ** 2).sum(axis=1)
        assert got[r["vec_id"]] == cells[int(np.argmin(d2))]


def test_appended_index_finds_new_vectors(spark, emb):
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    new_batch = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 40))
    centers, assigned = ivf_index(corpus, n_cells=8, seed=17)
    appended = assigned.unionByName(assign_to_cells(new_batch, centers))
    # query a vector FROM the new batch: its exact self-match (sim=1)
    # must now be retrievable from the appended index
    q = emb.where(F.col("vec_id") == 1)
    res = ivf_query_index(q, centers, appended, k=1, n_probe=1).collect()
    assert len(res) == 1
    assert res[0]["c_id"] == 1
    assert res[0]["sim"] == pytest.approx(1.0, abs=1e-6)


def test_ivf_index_maintain_currency_and_scoped_rewrite(
    spark, emb, tmp_path_factory
):
    """(a) Currency: the maintained stored index equals assigning the
    logical post-maintenance corpus from scratch with the SAME
    centers. (b) Cell-scoped copy-on-write: untouched cell partition
    files are byte-identical (never rewritten). (c) A cell emptied by
    deletes disappears from the stored index."""
    import os

    from dislib_spark.vector.search import ivf_index_maintain

    vid = F.col("vec_id")
    corpus = emb.where(vid % 2 == 0)
    centers, assigned = ivf_index(corpus, n_cells=8, centers="seed")
    tmp = str(tmp_path_factory.mktemp("ivfmaint"))
    path = f"{tmp}/assignments"
    assigned.write.partitionBy("cell").parquet(path)

    def files(p):
        out = {}
        for root, _, names in os.walk(p):
            for n in names:
                if n.endswith(".parquet"):
                    f = os.path.join(root, n)
                    out[f] = os.path.getmtime(f)
        return out

    before = files(path)
    updates = emb.where((vid % 2 == 0) & (vid % 10 == 4)).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    inserts = emb.where((vid % 2 == 1) & (vid < 40)).select(
        "vec_id", "embedding"
    )
    deletes = emb.where((vid % 2 == 0) & (vid % 10 == 0)).select(
        "vec_id"
    )
    ivf_index_maintain(
        spark, path, centers, updates.unionByName(inserts), deletes
    )
    stored = spark.read.parquet(path)

    # (a) currency vs from-scratch assignment of the logical state
    survivors = corpus.where((vid % 10 != 0) & (vid % 10 != 4)).select(
        "vec_id", "embedding"
    )
    logical = survivors.unionByName(updates).unionByName(inserts)
    want = assign_to_cells(logical, centers)
    got_rows = sorted(
        (r["c_id"], r["cell"], tuple(r["c_vec"]))
        for r in stored.collect()
    )
    want_rows = sorted(
        (r["c_id"], r["cell"], tuple(r["c_vec"]))
        for r in want.collect()
    )
    assert got_rows == want_rows

    # (b) cell-scoped rewrite: a ONE-ROW follow-up delete must
    # rewrite only that row's cell partition — every other cell's
    # files stay byte-identical (same names, same mtimes)
    del before  # the big batch legitimately touches every cell
    one = stored.orderBy("c_id").limit(1).collect()[0]
    before2 = files(path)
    ivf_index_maintain(
        spark,
        path,
        centers,
        deletes=spark.createDataFrame(
            [(one["c_id"],)], "vec_id long"
        ),
    )
    after2 = files(path)
    untouched = 0
    for f, mtime in before2.items():
        cell = int(f.split("cell=")[1].split(os.sep)[0])
        if cell != one["cell"]:
            assert f in after2 and after2[f] == mtime, f
            untouched += 1
    assert untouched > 0
    assert spark.read.parquet(path).where(
        F.col("c_id") == one["c_id"]
    ).count() == 0

    # (c) a synthetic lone-cell delete removes the cell directory
    lone = spark.createDataFrame(
        [(999_999, [0.0] * 64, 7777)],
        "c_id long, c_vec array<double>, cell int",
    )
    path2 = f"{tmp}/assignments2"
    assigned.unionByName(lone).write.partitionBy("cell").parquet(path2)
    assert os.path.isdir(f"{path2}/cell=7777")
    ivf_index_maintain(
        spark,
        path2,
        centers,
        deletes=spark.createDataFrame([(999_999,)], "vec_id long"),
    )
    assert not os.path.isdir(f"{path2}/cell=7777")
    assert spark.read.parquet(path2).where(
        F.col("c_id") == 999_999
    ).count() == 0


def test_pq_index_maintain_currency_and_scoped_rewrite(
    spark, emb, tmp_path_factory
):
    """v29's storage gates, mirroring the IVF ones: (a) currency —
    the maintained stored codes equal re-encoding the logical
    post-maintenance corpus from scratch with the SAME (stale)
    codebooks; (b) cell-scoped copy-on-write — a one-row follow-up
    delete leaves every other cell partition's files byte-identical;
    (c) a cell emptied by deletes disappears."""
    import os

    from dislib_spark.vector.search import (
        pq_codebooks,
        pq_encode,
        pq_index_maintain,
    )

    vid = F.col("vec_id")
    corpus = emb.where(vid % 2 == 0)
    books = pq_codebooks(corpus, method="seed")
    tmp = str(tmp_path_factory.mktemp("pqmaint"))
    path = f"{tmp}/codes"
    pq_encode(corpus, books).withColumn(
        "cell", F.col("codes")[0]
    ).write.partitionBy("cell").parquet(path)

    updates = emb.where((vid % 2 == 0) & (vid % 10 == 4)).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    inserts = emb.where((vid % 2 == 1) & (vid < 40)).select(
        "vec_id", "embedding"
    )
    deletes = emb.where((vid % 2 == 0) & (vid % 10 == 0)).select(
        "vec_id"
    )
    pq_index_maintain(
        spark, path, books, updates.unionByName(inserts), deletes
    )
    stored = spark.read.parquet(path)

    # (a) currency
    survivors = corpus.where((vid % 10 != 0) & (vid % 10 != 4)).select(
        "vec_id", "embedding"
    )
    logical = survivors.unionByName(updates).unionByName(inserts)
    want = sorted(
        (r["id"], tuple(r["codes"]))
        for r in pq_encode(logical, books).collect()
    )
    got = sorted(
        (r["id"], tuple(r["codes"])) for r in stored.collect()
    )
    assert got == want
    # every stored row's partition key matches its first code
    assert stored.where(
        F.col("cell") != F.col("codes")[0]
    ).count() == 0

    # (b) one-row delete rewrites only its own cell
    def files(p):
        out = {}
        for root, _, names in os.walk(p):
            for n in names:
                if n.endswith(".parquet"):
                    f = os.path.join(root, n)
                    out[f] = os.path.getmtime(f)
        return out

    one = stored.orderBy("id").limit(1).collect()[0]
    before = files(path)
    pq_index_maintain(
        spark,
        path,
        books,
        deletes=spark.createDataFrame([(one["id"],)], "vec_id long"),
    )
    after = files(path)
    untouched = 0
    for f, mtime in before.items():
        cell = int(f.split("cell=")[1].split(os.sep)[0])
        if cell != one["cell"]:
            assert f in after and after[f] == mtime, f
            untouched += 1
    assert untouched > 0
    assert spark.read.parquet(path).where(
        F.col("id") == one["id"]
    ).count() == 0

    # (c) a synthetic lone-cell delete removes the cell directory
    lone = spark.createDataFrame(
        [(999_999, [0] * len(books), 7777)],
        "id long, codes array<int>, cell int",
    )
    path2 = f"{tmp}/codes2"
    pq_encode(corpus, books).withColumn(
        "cell", F.col("codes")[0]
    ).unionByName(lone).write.partitionBy("cell").parquet(path2)
    assert os.path.isdir(f"{path2}/cell=7777")
    pq_index_maintain(
        spark,
        path2,
        books,
        deletes=spark.createDataFrame([(999_999,)], "vec_id long"),
    )
    assert not os.path.isdir(f"{path2}/cell=7777")
    assert spark.read.parquet(path2).where(
        F.col("id") == 999_999
    ).count() == 0


def test_ivfsq_stored_index_equals_in_memory(
    spark, emb, tmp_path_factory
):
    """IVF-SQ8 (the v33 kernel): the parquet-round-tripped index
    (partitionBy(cell) codes + 1-row stats + centers) probes to
    exactly the in-memory composition's results, and ivfsq_topk IS
    the build+probe composition."""
    from dislib_spark.vector.search import (
        ivfsq_index,
        ivfsq_query_index,
        ivfsq_topk,
    )

    corpus = emb.where(F.col("vec_id") % 2 == 0)
    queries = emb.where(
        (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 10)
    )
    ctrs, stats, codes = ivfsq_index(corpus, n_cells=8, centers="seed")
    mem = ivfsq_query_index(
        queries, ctrs, stats, codes, corpus, k=5, n_probe=3
    )
    direct = ivfsq_topk(
        queries, corpus, k=5, n_cells=8, n_probe=3, centers="seed"
    )
    assert _key_rows(direct) == _key_rows(mem)

    tmp = str(tmp_path_factory.mktemp("ivfsqidx"))
    codes.write.partitionBy("cell").parquet(f"{tmp}/codes")
    stats.write.parquet(f"{tmp}/stats")
    ctrs.write.parquet(f"{tmp}/ctrs")
    stored = ivfsq_query_index(
        queries,
        spark.read.parquet(f"{tmp}/ctrs"),
        spark.read.parquet(f"{tmp}/stats"),
        spark.read.parquet(f"{tmp}/codes"),
        corpus,
        k=5,
        n_probe=3,
    )
    assert _key_rows(stored) == _key_rows(mem)


def test_ivfsq_recall_gate_kmeans(spark, emb):
    """The MLlib-KMeans-trained IVF-SQ8 variant (the production path
    the seed oracle can't value-check) must hit recall@5 ≥ 0.6
    against brute-force exact cosine on a 10-query batch — cell
    pruning plus 8-bit scalar quantization, with exact rerank, keeps
    most of the true top-k. Self-match must survive: every query
    vector IS in the corpus, so rank-1 is itself at sim 1."""
    from dislib_spark.vector.search import cosine_topk, ivfsq_topk

    q = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(q, emb, k=5).select("q_id", "c_id")
    approx = ivfsq_topk(
        q, emb, k=5, n_cells=8, n_probe=3, centers="kmeans"
    )
    hits = exact.join(
        approx.select("q_id", "c_id"), ["q_id", "c_id"]
    ).count()
    assert hits / 50.0 >= 0.6, hits
    top1 = {
        r["q_id"]: (r["c_id"], r["sim"])
        for r in approx.where(F.col("rank") == 1).collect()
    }
    for qid, (cid, sim) in top1.items():
        assert cid == qid and sim == pytest.approx(1.0, abs=1e-6)


def test_ivfsq_index_maintain_currency_and_scoped_rewrite(
    spark, emb, tmp_path_factory
):
    """The SQ8 twin of ivf_index_maintain's gates: (a) currency —
    the maintained stored codes equal encoding the logical
    post-maintenance corpus with the STALE grid + STALE centers from
    scratch; (b) cell-scoped copy-on-write — untouched cell partition
    files byte-identical; (c) a cell emptied by deletes disappears."""
    import os

    from dislib_spark.vector.quantize import sq8_encode_with_stats
    from dislib_spark.vector.search import (
        assign_to_cells,
        ivfsq_index,
        ivfsq_index_maintain,
    )

    vid = F.col("vec_id")
    corpus = emb.where(vid % 2 == 0)
    centers, stats, codes = ivfsq_index(corpus, n_cells=8, centers="seed")
    tmp = str(tmp_path_factory.mktemp("ivfsqmaint"))
    path = f"{tmp}/codes"
    codes.write.partitionBy("cell").parquet(path)

    def files(p):
        out = {}
        for root, _, names in os.walk(p):
            for n in names:
                if n.endswith(".parquet"):
                    f = os.path.join(root, n)
                    out[f] = os.path.getmtime(f)
        return out

    before = files(path)
    updates = emb.where((vid % 2 == 0) & (vid % 10 == 4)).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    inserts = emb.where((vid % 2 == 1) & (vid < 40)).select(
        "vec_id", "embedding"
    )
    deletes = emb.where((vid % 2 == 0) & (vid % 10 == 0)).select(
        "vec_id"
    )
    ivfsq_index_maintain(
        spark, path, centers, stats,
        updates.unionByName(inserts), deletes,
    )
    stored = spark.read.parquet(path)

    survivors = corpus.where((vid % 10 != 0) & (vid % 10 != 4)).select(
        "vec_id", "embedding"
    )
    logical = survivors.unionByName(updates).unionByName(inserts)
    want_assign = assign_to_cells(logical, centers)
    want_codes = sq8_encode_with_stats(
        want_assign.select(
            F.col("c_id").alias("vec_id"),
            F.col("c_vec").alias("embedding"),
        ),
        "embedding",
        stats,
    ).select(F.col("vec_id").alias("c_id"), "codes")
    want = {
        (r["c_id"], r["cell"], tuple(r["codes"]))
        for r in want_assign.select("c_id", "cell")
        .join(want_codes, "c_id")
        .collect()
    }
    got = {
        (r["c_id"], int(r["cell"]), tuple(r["codes"]))
        for r in stored.collect()
    }
    assert got == want

    # (b) untouched cells' files byte-identical
    touched_ids = updates.select("vec_id").unionByName(
        inserts.select("vec_id")
    )
    touched_cells = {
        int(r["cell"])
        for r in stored.join(
            touched_ids,
            stored["c_id"] == touched_ids["vec_id"],
            "left_semi",
        )
        .select("cell")
        .distinct()
        .collect()
    }
    after = files(path)
    for f, mtime in before.items():
        cell = int(f.split("cell=")[1].split("/")[0])
        if cell not in touched_cells and f in after:
            assert after[f] == mtime, f
