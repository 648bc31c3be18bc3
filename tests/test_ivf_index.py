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
