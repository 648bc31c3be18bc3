"""Testdata table loaders (TPC-H-ish star schema + events/documents/
embeddings, see TESTDATA.md / FIXTURES.md §A).

At cluster scale these would be external parquet/iceberg tables;
``spark.read.parquet`` gives predicate pushdown + column pruning for
free, which every query in ``dislib_spark.queries`` relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Pure ``spark.read.parquet`` so Catalyst can push
    filters/projections into the scan (check: PushedFilters/ReadSchema
    in ``.explain``).

    ``events.parquet`` stores INT64 TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is on. That flag is a
    runtime SQL conf, so set it here rather than relying on the session
    factory — any vanilla ``SparkSession`` (e.g. the correctness
    harness's) must be able to read every table.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long via nanosAsLong → convert to
        # microsecond timestamp (still a pushdown-friendly projection).
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
