"""MERGE INTO semantics (sources.merge): update/insert/delete arms,
NULL-in-update-wins, copy-on-write path round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dislib_spark.sources.merge import merge_into, merge_into_path


def _t(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )


def test_update_insert_delete_arms(spark):
    target = _t(spark)
    updates = spark.createDataFrame(
        [
            (2, "B", 99.0),   # matched -> update
            (4, "d", 40.0),   # unmatched -> insert
            (3, "DEL", 0.0),  # matched + delete condition -> delete
        ],
        "k long, s string, v double",
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in merge_into(
            target, updates, ["k"], delete_condition=F.col("s") == "DEL"
        ).collect()
    }
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}


def test_matched_update_null_column_wins(spark):
    target = _t(spark)
    updates = spark.createDataFrame(
        [(1, None, 11.0)], "k long, s string, v double"
    )
    got = {r["k"]: (r["s"], r["v"]) for r in merge_into(target, updates, ["k"]).collect()}
    # MERGE replaces the whole row on match — the NULL is kept, not
    # coalesced back to the target value
    assert got[1] == (None, 11.0)
    assert got[2] == ("b", 20.0)


def test_schema_mismatch_raises(spark):
    target = _t(spark)
    bad = spark.createDataFrame([(1, "x")], "k long, s string")
    with pytest.raises(ValueError, match="identical schemas"):
        merge_into(target, bad, ["k"])


def test_merge_into_path_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _t(spark).write.parquet(path)
    updates = spark.createDataFrame(
        [(3, "C", 33.0), (5, "e", 50.0)], "k long, s string, v double"
    )
    merge_into_path(spark, path, updates, ["k"])
    got = {
        r["k"]: (r["s"], r["v"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b", 20.0),
        3: ("C", 33.0),
        5: ("e", 50.0),
    }


def test_merge_into_path_crash_safe_swap(spark, tmp_path):
    """The rewrite goes through a temp sibling + rename swap: no
    leftover __tmp__/__old__ dirs after success, and stale leftovers
    from a prior crash are cleared instead of breaking the merge."""
    import os

    path = str(tmp_path / "tbl2")
    _t(spark).write.parquet(path)
    # simulate debris from a crashed previous run
    os.makedirs(path + ".__tmp__", exist_ok=True)
    os.makedirs(path + ".__old__", exist_ok=True)
    updates = spark.createDataFrame(
        [(1, "A", 11.0)], "k long, s string, v double"
    )
    merge_into_path(spark, path, updates, ["k"])
    assert not os.path.exists(path + ".__tmp__")
    assert not os.path.exists(path + ".__old__")
    got = {r["k"]: r["s"] for r in spark.read.parquet(path).collect()}
    assert got[1] == "A" and set(got) == {1, 2, 3}


def test_merge_into_path_mid_swap_recovery_prefers_tmp(spark, tmp_path):
    """Crash state AFTER path→old but BEFORE tmp→path: the target dir
    is gone, the merged result lives in .__tmp__ and the prior table
    in .__old__. Recovery must complete the swap from tmp (never
    delete the only surviving copies) and then merge normally."""
    import os
    import shutil

    path = str(tmp_path / "tbl3")
    _t(spark).write.parquet(path)
    # build a genuine "merged result" in tmp (k=1 already updated)
    merged = merge_into(
        spark.read.parquet(path),
        spark.createDataFrame([(1, "A", 11.0)], "k long, s string, v double"),
        ["k"],
    )
    merged.write.parquet(path + ".__tmp__")
    os.rename(path, path + ".__old__")  # the mid-swap crash state

    updates = spark.createDataFrame(
        [(2, "B", 22.0)], "k long, s string, v double"
    )
    merge_into_path(spark, path, updates, ["k"])
    got = {r["k"]: r["s"] for r in spark.read.parquet(path).collect()}
    # tmp (with k=1 → "A") was recovered, then k=2 → "B" merged on top
    assert got[1] == "A" and got[2] == "B" and set(got) == {1, 2, 3}
    assert not os.path.exists(path + ".__tmp__")
    assert not os.path.exists(path + ".__old__")
    shutil.rmtree(path)


def test_merge_into_path_mid_swap_recovery_rolls_back_from_old(
    spark, tmp_path
):
    """Crash state where only .__old__ survived (tmp was lost): roll
    the prior table back instead of deleting it."""
    import os

    path = str(tmp_path / "tbl4")
    _t(spark).write.parquet(path)
    os.rename(path, path + ".__old__")
    updates = spark.createDataFrame(
        [(3, "C", 33.0)], "k long, s string, v double"
    )
    merge_into_path(spark, path, updates, ["k"])
    got = {r["k"]: r["s"] for r in spark.read.parquet(path).collect()}
    assert got[3] == "C" and set(got) == {1, 2, 3}


def test_merge_into_path_missing_target_no_survivors_raises(
    spark, tmp_path
):
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="no .*survivor"):
        merge_into_path(
            spark,
            str(tmp_path / "nope"),
            spark.createDataFrame([(1, "A", 1.0)], "k long, s string, v double"),
            ["k"],
        )
