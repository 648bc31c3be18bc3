"""Parquet schema evolution: mixed-version files read as one table.

The lakehouse ingestion reality at 100 TB: yesterday's files lack the
column added today. ``mergeSchema`` must widen the scan schema and
null-fill the missing column; unionByName with
``allowMissingColumns`` is the in-memory twin."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_parquet_merge_schema_mixed_files(spark, tmp_path):
    base = str(tmp_path / "evo")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    v1.write.parquet(base + "/batch=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.7)],
        "id long, name string, score double",
    )
    v2.write.parquet(base + "/batch=2")

    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[3] == ("c", 0.5)
    # old files' missing column is null, not dropped
    assert df.where(F.col("score").isNull()).count() == 2


def test_union_by_name_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame(
        [(2, 0.9)], "id long, score double"
    )
    u = a.unionByName(b, allowMissingColumns=True)
    assert set(u.columns) == {"id", "name", "score"}
    got = {r.id: (r.name, r.score) for r in u.collect()}
    assert got == {1: ("x", None), 2: (None, 0.9)}
