"""Table profiling: ANALYZE-style per-column statistics in one job.

The stats-collection pass every warehouse runs before cost-based
optimization (null fractions drive outer-join reordering, NDV drives
join-strategy choice) and every pipeline runs as a data-quality
snapshot. N/A in the reference (no catalog layer).

Scale: one aggregate job. Exact ``countDistinct`` per column makes
the result oracle-checkable; Catalyst plans the k distinct aggregates
as a single Expand (one scan, k× row multiplication before the
partial agg) — at 100 TB swap ``approx_count_distinct`` (HLL, no
Expand) behind the same column names, exactly like the x05→
approx_percentile note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nonnull, n_nulls, n_distinct) per column.

    ``n_distinct`` counts distinct NON-NULL values (SQL COUNT
    (DISTINCT) semantics on both engines).
    """
    cols = cols if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"nn_{c}").alias("n_nonnull"),
            (F.col("__n") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
        ).alias(f"p_{c}")
        for c in cols
    ]
    return row.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")
