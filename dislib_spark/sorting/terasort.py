"""TeraSort.

Reference: ``dislib/sorting/terasort/base.py:10-488`` — range-
partition values into num_buckets by linspace(min, max·1.1), sort
each bucket, reassemble; sorts the FLATTENED values globally, or each
listed column independently.

Spark-first: ``orderBy`` IS TeraSort — Spark's sort is a sampled
RangePartitioner + per-partition sort (strictly better bucketing than
the reference's min/max linspace, SURVEY.md §2.6). The class exists
for API parity; ``num_buckets`` maps to shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.array.core import DsArray, _FEAT, _ROW
from dislib_spark.utils.base import with_global_index


def terasort(
    x: DsArray,
    column_indexes: list[int] | None = None,
) -> DsArray:
    """Global sort. Without column_indexes: flatten all values, sort
    globally, refill row-major (reference _terasort :343-368). With
    column_indexes: sort each listed column independently, leave the
    others in place. Re-keying after the range-partitioned sort is
    JVM-side (utils.base.with_global_index) — no Python RDD hop."""
    n, d = x.shape
    if column_indexes is None:
        cells = x.df.select(F.explode(F.col(_FEAT)).alias("v"))
        flat = with_global_index(cells, ["v"], "_g").select(
            F.expr(f"_g DIV {d}").alias("i"),
            F.pmod("_g", F.lit(d)).alias("k"),
            "v",
        )
        rows = flat.groupBy("i").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "v"))),
                lambda s: s["v"],
            ).alias(_FEAT)
        )
        return DsArray(
            rows.select(F.col("i").alias(_ROW), _FEAT), (n, d)
        )

    out = x
    for j in column_indexes:
        col_df = with_global_index(
            x.df.select(F.element_at(F.col(_FEAT), j + 1).alias("v")),
            ["v"],
            _ROW,
        ).select(_ROW, F.array(F.col("v").cast("double")).alias(_FEAT))
        out = out.set_column(j, DsArray(col_df, (n, 1)))
    return out


class TeraSort:
    """API-parity facade (reference sorting/terasort/base.py:10-47).
    range_min/range_max/num_buckets are accepted and ignored: Spark's
    RangePartitioner samples real quantiles instead."""

    def __init__(
        self,
        range_min: float | None = None,
        range_max: float | None = None,
        column_indexes: list[int] | None = None,
        num_buckets: int | None = None,
    ):
        self.column_indexes = column_indexes

    def fit(self, x: DsArray) -> "TeraSort":
        return self  # sampling happens inside orderBy

    def sort(self, x: DsArray) -> DsArray:
        return terasort(x, self.column_indexes)
