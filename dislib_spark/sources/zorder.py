"""Z-order (Morton) clustering for multi-dimensional data skipping.

The lakehouse layout optimization (Delta/Iceberg `OPTIMIZE ZORDER
BY`): interleave the bits of several key columns into one Morton
code, range-partition + sort the data by it, and every output file
covers a small hyper-rectangle of the key space — so parquet
row-group/file min-max stats prune scans filtered on ANY of the
keys, not just the leading sort column. No counterpart in the
reference (single-machine block grids need no layout optimization);
north-star surface for the 100 TB target, where scan pruning is the
difference between touching 100 TB and touching 100 GB.

Everything is JVM bit arithmetic (shiftright/bitwiseAND/shiftleft
folds — no UDFs); the layout step is one range exchange, exactly a
TeraSort by the z-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) integer cells with fixed
    bounds (fixed so the cell grid — and therefore the layout — is
    stable across batches; recompute bounds only on explicit
    re-optimization)."""
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi - lo)
    ) * F.lit(float(cells))
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
        F.lit(int(cells)),
    )


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton code: bit-interleave ``len(cols)`` non-negative integer
    columns (each < 2^bits) into one long. ``d * bits`` must stay
    ≤ 63 (ANSI-safe long). Pure JVM expression — codegen'd, no UDF."""
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols × {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cc = c.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cc, i).bitwiseAND(F.lit(1)), d * i + j
            )
    return z


def cluster_by_zorder(
    df: DataFrame,
    cols: list[Column],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` so each output partition covers a compact
    z-range (⇒ a small hyper-rectangle in key space): one range
    exchange on the Morton code + an in-partition sort. Write the
    result with ``.write.parquet`` and the per-file min-max stats
    become multi-dimensional scan filters."""
    zed = df.withColumn("_z", zorder_value(cols, bits))
    parted = (
        zed.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else zed.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")
