"""Streaming CDC apply: change stream → upserted parquet table.

Composes the engine's two CDC kernels into the standard "apply a
change feed to a serving table" sink: within each micro-batch the
changes compact to latest-per-key (the x43 kernel — a batch may carry
several changes for one key), then MERGE into the target (the x51
kernel: update / insert / delete-marker arms). N/A in the reference
(no streaming layer); the Delta/Iceberg `MERGE INTO ... USING
changes` shape on plain parquet.

Scale: per micro-batch cost is one window over the (small) batch +
one full-outer join against the target — at 100 TB the target is
partitioned and the merge rewrite is partition-scoped (see
``sources.merge`` docstring). Delivery is effectively-once for a
single writer: the streaming checkpoint replays unacknowledged
batches and the merge is idempotent (re-applying a batch yields the
same table), while the sink's temp-dir-then-rename swap in
``merge_into_path`` never deletes the prior table before the new one
is durable — a crash mid-swap leaves both the old and new table on
disk for manual recovery rather than losing data. True transactional
exactly-once needs a table format with commit logs (Delta/Iceberg).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def compact_changes(
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Latest change per key (ties broken by the remaining column
    values via a deterministic struct ordering) — the x43 kernel."""
    others = [c for c in changes.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        F.desc(ts_col), *[F.desc(c) for c in others if c != ts_col]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    spark,
    path: str,
    changes: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delete_condition: Column | None = None,
) -> None:
    """Compact ``changes`` to latest-per-key and MERGE them into the
    parquet table at ``path`` (bootstraps the table from the first
    batch if it doesn't exist yet)."""
    from dislib_spark.sources.merge import merge_into_path

    latest = compact_changes(changes, keys, ts_col)
    if not os.path.exists(path):
        if delete_condition is not None:
            latest = latest.where(~delete_condition)
        latest.write.parquet(path)
        return
    merge_into_path(spark, path, latest, keys, delete_condition)


def cdc_apply_sink(
    changes_stream: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    ts_col: str = "ts",
    delete_condition: Column | None = None,
    **trigger,
):
    """Start the foreachBatch CDC-apply sink. ``delete_condition``
    (on the change rows, e.g. ``F.col("op") == "D"``) routes matched
    keys to the delete arm. Use ``availableNow=True`` kwargs for
    batch-drain tests. Returns the started StreamingQuery."""
    spark = changes_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes(
            spark, path, batch_df, keys, ts_col, delete_condition
        )

    return (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def erasure_sink(
    keys_stream: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    partition_col: str,
    counts: list | None = None,
    **trigger,
):
    """Start a foreachBatch GDPR-erasure sink: each micro-batch of
    forget-me keys is applied to the parquet table at ``path`` with
    the partition-scoped crash-safe ``sources.merge.erase_keys_path``
    (only the partitions holding an erased key's rows are rewritten,
    via the journaled tmp+rename swap). Erasure is idempotent and
    batch-associative — any micro-batching of the same key set yields
    the same table — so checkpoint replays of unacknowledged batches
    are safe, the same effectively-once argument as ``cdc_apply_sink``.
    ``counts``, if a list, collects each batch's rewritten-partition
    count. Returns the started StreamingQuery."""
    from dislib_spark.sources.merge import erase_keys_path

    spark = keys_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        n = erase_keys_path(
            spark, path, batch_df, key_col, partition_col
        )
        if counts is not None:
            counts.append(n)

    return (
        keys_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def retention_sink(
    ticks_stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str,
    ttl_days,
    as_of_col: str = "as_of",
    counts: list | None = None,
    **trigger,
):
    """Start a foreachBatch RETENTION sink: each micro-batch is a
    watermark TICK (rows carrying an ``as_of`` day string — the
    operational shape where a scheduler emits one tick per day/hour),
    and each tick enforces the TTL policy against the parquet table
    at ``path`` with the partition-scoped crash-safe
    ``sources.merge.enforce_retention_path`` (whole-expired days
    dropped O(1), mixed days rewritten copy-on-write). Retention is
    idempotent and watermark-monotone — enforcing at ticks t₁ ≤ t₂
    equals one enforcement at t₂ — so checkpoint replays of
    unacknowledged ticks are safe (the s16 effectively-once
    argument). ``counts``, if a list, collects each batch's
    (n_dropped, n_rewritten). Returns the started StreamingQuery."""
    from dislib_spark.sources.merge import enforce_retention_path

    spark = ticks_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        ticks = [r[as_of_col] for r in batch_df.collect()]
        if not ticks:
            return
        # monotonicity: only the newest tick in the batch matters
        n = enforce_retention_path(
            spark, path, partition_col, ttl_days, max(ticks)
        )
        if counts is not None:
            counts.append(n)

    return (
        ticks_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
