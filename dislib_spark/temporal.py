"""Temporal joins: as-of (point-in-time) and interval joins.

N/A in the reference (dislib has no relational/temporal layer); part
of the engine's extended query surface. Both operators are built to
survive 100 TB:

- ``asof_join`` NEVER materializes the O(|L|·|R|) range join a naive
  ``l.ts >= r.ts`` theta-join would produce. It unions both sides and
  takes one window pass per key — a single hash-partition shuffle on
  the join key, sort-merge within partitions, linear output.
- ``interval_join`` expresses the time band as an equi-join on the
  key with a residual range predicate, so Catalyst plans a shuffled
  hash/sort-merge join on the key (never a BroadcastNestedLoopJoin),
  and the SAME code path works for two streaming inputs (Spark's
  stream-stream join with watermarks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dislib_spark.streaming.windows import _watermarked


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the single
    right row with the greatest ``right_time`` <= ``left_time`` for
    the same ``on`` key (inclusive, like DuckDB/pandas ``ASOF``).

    Matched right columns come back prefixed ``asof_``; an extra
    ``asof_<right_time>`` column carries the matched timestamp.
    ``tiebreak`` names a right column that breaks equal-timestamp
    ties (max wins) deterministically. ``tolerance`` (an INTERVAL
    string, e.g. ``"2 hours"``) nulls out matches older than
    ``left_time - tolerance``. ``how`` is ``inner`` (drop unmatched
    left rows) or ``left``.

    Scale: one shuffle (hash on ``on``), one sort, one window pass —
    the union trick turns the range join into a linear merge. Key
    skew behaves like any windowed op (AQE cannot split a single hot
    key); salt upstream if one key dominates.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, right_time)
    ]
    payload = [right_time, *[c for c in rcols if c != right_time]]
    if tiebreak is not None and tiebreak not in payload:
        payload.append(tiebreak)

    r_sel = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__rp"),
    )
    rp_type = r_sel.schema["__rp"].dataType
    l_sel = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rp_type).alias("__rp"),
        *[F.col(c) for c in left.columns],
    )
    r_full = r_sel.select(
        "__k", "__t", "__side", "__rp",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    u = l_sel.unionByName(r_full)

    # Right rows sort BEFORE the left row at the same timestamp
    # (__side 0 < 1) so the match is inclusive; among equal-time
    # right rows the max tiebreak sorts last and wins.
    order: list[Column] = [F.col("__t").asc(), F.col("__side").asc()]
    if tiebreak is not None:
        order.append(F.col("__rp")[tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rp", ignorenulls=True).over(w)
    if tolerance is not None:
        matched = F.when(
            matched[right_time]
            >= F.col("__t") - F.expr(f"INTERVAL {tolerance}"),
            matched,
        )
    res = (
        u.withColumn("__m", matched)
        .where(F.col("__side") == 1)
        .select(
            *left.columns,
            F.col("__m")[right_time].alias(f"asof_{right_time}"),
            *[
                F.col("__m")[c].alias(f"asof_{c}")
                for c in payload
                if c != right_time
            ],
        )
    )
    if how == "inner":
        res = res.where(F.col(f"asof_{right_time}").isNotNull())
    return res


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    how: str = "inner",
    watermark: str | None = None,
) -> DataFrame:
    """Join right rows whose ``right_time`` falls within
    ``[left_time + lower, left_time + upper]`` for the same key.

    Works identically for batch and streaming inputs. With two
    streaming inputs, pass ``watermark`` (e.g. ``"1 hour"``): both
    sides are watermarked and the range condition lets Spark bound
    the join state (classic stream-stream interval join).

    Scale: equi-join on ``on`` with a residual band predicate —
    shuffled hash / sort-merge join, linear state, never a nested
    loop. The band width bounds per-key state in streaming.
    """
    if left.isStreaming and watermark is not None:
        left = _watermarked(left, left_time, watermark)
    if right.isStreaming and watermark is not None:
        right = _watermarked(right, right_time, watermark)
    lhs = left.alias("l")
    rhs = right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_time}")
            >= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_time}")
            <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return lhs.join(rhs, cond, how)
