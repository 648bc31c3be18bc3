"""Sequence packing for LLM pre-training: concatenate documents in a
deterministic order and chunk the token stream into fixed-budget
training sequences (GPT-style concat-then-chunk packing). N/A in the
reference; part of this engine's training-pipeline surface.

Semantics: within each shard, documents are laid out in ``order_col``
order; a document is assigned to the sequence containing its FIRST
token (``floor(exclusive_cumsum / budget)``). A document may straddle
a boundary — the consumer continues it into the next sequence, which
is exactly what concat-then-chunk dataloaders do. The assignment is a
pure function of (shard, order, token counts): reproducible across
reruns, cluster layouts, and engines.

Scale design: one window aggregation partitioned by ``shard_col`` —
parallelism = number of shards, no global sort. Packing a 100 TB
corpus in ONE global order would force a single-partition window;
real pipelines pack per input shard/file, which this API makes the
default unit. Pass ``shard_col=None`` only for small data (it is a
documented single-partition path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each row a ``seq_id`` (per-shard sequence number) and
    ``tok_offset`` (the row's first-token offset inside the shard's
    concatenated stream)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    part = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    return df.withColumn("tok_offset", off).withColumn(
        "seq_id", F.floor(F.col("tok_offset") / budget)
    )


def packing_stats(
    packed: DataFrame,
    token_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Per-sequence fill report: document count, token total, and
    fill ratio vs the budget (>1 when a straddling document overflows
    the boundary — the consumer's chunker truncates)."""
    keys = ([shard_col] if shard_col else []) + ["seq_id"]
    return packed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("seq_tokens"),
        F.round(F.sum(token_col) / F.lit(float(budget)), 6).alias(
            "fill_ratio"
        ),
    )
