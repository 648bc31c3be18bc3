"""Bucketed and partitioned parquet sinks — the storage-layout side
of shuffle avoidance at 100 TB.

Spark's bucketing (``DataFrameWriter.bucketBy`` + ``saveAsTable``)
pre-hash-partitions data ON DISK by a join/agg key. Two tables
bucketed the same way join with ZERO exchange: the SortMergeJoin
reads co-located buckets directly (``.explain`` shows no Exchange
under either side). For a 100 TB fact table that is joined on the
same key daily, paying one shuffle at write time instead of one per
query is the single biggest cost lever Spark offers.

Partitioned writes (``partitionBy``) give partition PRUNING instead:
a filter on the partition column skips whole directories at plan
time (``PartitionFilters`` in the scan node).

Analogue surface: the reference keeps arrays pre-chunked in a fixed
block grid (data/array.py block layout) so operators can pair blocks
without data movement — bucketing is the Spark-native equivalent of
that on-disk alignment contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed table (external when ``path`` is
    given, managed otherwise). ``sort_cols`` additionally sorts
    within buckets so a later SortMergeJoin skips its sort too.
    ``n_buckets`` should be sized so one bucket fits an executor's
    read chunk (at 100 TB: thousands of buckets, NOT dozens)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def load_table_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table WITH its bucket metadata (a plain
    ``spark.read.parquet`` of the underlying files would lose the
    bucket spec and reintroduce the shuffle)."""
    return spark.table(table)


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write parquet hive-partitioned by ``partition_cols`` (low-
    cardinality columns only — one directory per value; a timestamp
    would create millions of dirs: derive a date/bucket column
    first)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def cluster_for_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """In-memory analogue of bucketing for a multi-step pipeline:
    repartition BOTH sides by the same keys once so every subsequent
    join/groupBy on those keys reuses the partitioning (Catalyst
    recognises the co-partitioning and plans no new Exchange). Use
    when the same keyed intermediate feeds several joins in one job
    but isn't worth persisting as a table."""
    if n_partitions:
        return (
            left.repartition(n_partitions, *keys),
            right.repartition(n_partitions, *keys),
        )
    return left.repartition(*keys), right.repartition(*keys)
