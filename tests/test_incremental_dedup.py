"""Incremental dedup-against-index: banding a new batch against a
stored LSH index finds exactly the cross-split pairs the one-shot
batch dedup finds (band hashes are content-determined, so the split
cannot change collisions), after a parquet round-trip of the index.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dislib_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_index_dedup_matches_batch_cross_pairs(spark, tmp_path):
    from dislib_spark.text.dedup import (
        dedup_against_index,
        minhash_index,
        minhash_lsh_pairs,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    archive = d.where(F.col("doc_id") % 2 == 0)
    batch = d.where(F.col("doc_id") % 2 == 1)

    # index round-trips through parquet partitioned by band
    ix_path = str(tmp_path / "lsh_index")
    minhash_index(archive).write.partitionBy("band_idx").parquet(ix_path)
    ix = spark.read.parquet(ix_path)

    got = {
        (r["new_id"], r["index_id"]): r["jaccard"]
        for r in dedup_against_index(batch, ix, threshold=0.3).collect()
    }

    # one-shot dedup over everything, restricted to cross-split pairs
    want = {}
    for r in minhash_lsh_pairs(
        d, threshold=0.3, max_bucket_size=None
    ).collect():
        a, b = r["a_id"], r["b_id"]
        if a % 2 != b % 2:  # one even (archive), one odd (batch)
            new_id, index_id = (a, b) if a % 2 == 1 else (b, a)
            want[(new_id, index_id)] = r["jaccard"]

    assert got == pytest.approx(want)
    assert len(got) > 0  # the fixture plants near-dups across parity


def test_index_appends_keep_it_current(spark):
    """Index ∪ new batch's own index rows == index of the union —
    the property that makes daily appends correct."""
    from dislib_spark.text.dedup import minhash_index

    d = load_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < 60)
    a = d.where(F.col("doc_id") < 30)
    b = d.where(F.col("doc_id") >= 30)
    merged = minhash_index(a).unionByName(minhash_index(b))
    whole = minhash_index(d)
    key = ["id", "band_idx", "band_hash"]
    assert (
        merged.select(key).exceptAll(whole.select(key)).count() == 0
        and whole.select(key).exceptAll(merged.select(key)).count() == 0
    )
