"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted for
non-SQL-expressible ops: MinHash/SimHash LSH, hyperplane/IVF ANN —
driver records the weaker rows-only check for those).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped-agg pricing summary (Q3) at sf0.001."""
    from dislib_spark.queries.relational import q3

    return q3(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dislib_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from dislib_spark.queries import all_oracles

    return all_oracles()
