"""Dynamic partition pruning evidence (SURVEY §4: Catalyst covers it
out of the box — this pins that it actually fires on our layouts).

A fact table partitioned by ship month joined to a FILTERED month
dimension must plan a ``dynamicpruningexpression`` partition filter:
at 100 TB this is the difference between scanning 12 partitions and
scanning 360. Also asserts the runtime result equals the statically
pruned equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.tables import load_table
from dislib_spark.utils.plancheck import plan_text

SF = "/root/testdata/sf0.001"


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    base = str(tmp_path / "li_parts")
    (
        li.withColumn(
            "ship_month", F.date_format("l_shipdate", "yyyy-MM")
        )
        .write.partitionBy("ship_month")
        .mode("overwrite")
        .parquet(base)
    )
    fact = spark.read.parquet(base)
    months = [
        (f"{y}-{m:02d}", 1 if y == 1996 else 0)
        for y in (1995, 1996, 1997)
        for m in range(1, 13)
    ]
    dim = spark.createDataFrame(months, "ship_month string, hot int")

    j = (
        fact.join(dim, "ship_month")
        .where(F.col("hot") == 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = plan_text(j)
    assert "dynamicpruning" in plan.lower(), plan

    got = j.collect()[0].n
    want = fact.where(
        F.col("ship_month").between("1996-01", "1996-12")
    ).count()
    assert got == want and got > 0
