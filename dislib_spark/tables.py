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

# (applicationId, sf_dir, name) -> DataFrame. This memoizes the LAZY
# scan plan only — a DataFrame holds no data; every action still
# reads the parquet files — so repeated load_table calls skip the
# ~100 ms of per-call file listing + footer/schema analysis
# (measured; hundreds of calls per full-surface sweep). Keyed by
# applicationId so a fresh session (e.g. the driver's vanilla
# harness) never sees another session's plan objects.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


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
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _PLAN_CACHE.get(key)
    if cached is not None:
        return cached
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
    _PLAN_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
