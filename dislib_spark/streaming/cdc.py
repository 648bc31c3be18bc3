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


_SCD2_OPEN = 4611686018427387904  # 2**62, the open-interval sentinel


def scd2_build(
    events: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts_s",
) -> DataFrame:
    """SCD2 dimension from an event set (the x65 build as a reusable
    kernel): one per-key lead window over the DEDUPLICATED events
    turns each (key, attrs, ts) into a validity interval
    ``[valid_from, valid_to)`` with ``valid_to = 2**62`` on the open
    (current) version and a dense per-key ``version`` number. Ties
    on ts order by the attribute columns — with the event identity
    being (key, attrs, ts) after the dedup, the build is a pure
    function of the event SET, which is what makes the incremental
    maintainer's replay exact."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in attr_cols]
    )
    return (
        events.select(key_col, *attr_cols, ts_col)
        .distinct()
        .select(
            key_col,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.coalesce(
                F.lead(ts_col).over(w), F.lit(_SCD2_OPEN)
            ).alias("valid_to"),
            F.row_number().over(w).alias("version"),
        )
    )


def scd2_apply(
    spark,
    path: str,
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts_s",
    n_buckets: int = 32,
    bucket_expr: Column | None = None,
) -> int:
    """Incrementally maintain a bucket-partitioned SCD2 dimension at
    ``path`` from a batch of change events — the streaming twin of
    the x65 batch build. The dimension is stored
    ``partitionBy("bucket")`` (``pmod(xxhash64(key), n_buckets)``),
    and a batch rewrites ONLY the buckets its keys hash into, through
    the same journaled crash-safe ``replace_partitions_path`` swap as
    erasure/retention/index maintenance — cost tracks the batch's
    bucket fan-out, never the dimension.

    Out-of-order arrivals are exact, not approximated: affected keys'
    stored intervals decompose losslessly back to events
    (``valid_from`` IS the event ts), union the batch, and rebuild
    per key — so a change older than the current open version splices
    into history exactly where a full replay would put it, instead of
    the close-the-open-row shortcut that silently corrupts late
    feeds. Because the build is a pure function of the deduplicated
    event set, re-applying a batch is a no-op (checkpoint-replay
    safe) and any micro-batching of the same events yields the same
    dimension — batch ≡ stream by construction. Returns the number
    of buckets rewritten.

    ``bucket_expr`` overrides the default skew-safe
    ``pmod(xxhash64(key), n_buckets)`` bucketing (e.g. a plain
    ``key % n`` for uniform integer keys, which a SQL oracle can
    replay)."""
    from dislib_spark.sources.merge import (
        _recover_partition_swap,
        replace_partitions_path,
    )

    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(
            F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets)
        )
    ).cast("int")
    ev = changes.select(key_col, *attr_cols, ts_col).withColumn(
        "bucket", bucket
    )
    if not os.path.exists(path):
        out = scd2_build(ev, key_col, attr_cols, ts_col).withColumn(
            "bucket", bucket
        )
        out.write.partitionBy("bucket").parquet(path)
        return out.select("bucket").distinct().count()
    _recover_partition_swap(path, "bucket")
    stored = spark.read.parquet(path)
    buckets = [r["bucket"] for r in ev.select("bucket").distinct().collect()]
    if not buckets:
        return 0
    affected = stored.where(F.col("bucket").isin(buckets))
    keys = ev.select(key_col).distinct()
    hit = affected.join(F.broadcast(keys), key_col, "left_semi")
    keep = affected.join(F.broadcast(keys), key_col, "left_anti")
    old_events = hit.select(
        key_col, *attr_cols, F.col("valid_from").alias(ts_col), "bucket"
    )
    rebuilt = scd2_build(
        old_events.unionByName(ev), key_col, attr_cols, ts_col
    ).withColumn("bucket", bucket)
    out = keep.select(rebuilt.columns).unionByName(rebuilt)
    replace_partitions_path(path, "bucket", buckets, out)
    return len(buckets)


def scd2_sink(
    changes_stream: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts_s",
    n_buckets: int = 32,
    counts: list | None = None,
    bucket_expr: Column | None = None,
    **trigger,
):
    """Start a foreachBatch streaming-SCD2 sink: each micro-batch of
    change events is folded into the bucket-partitioned dimension at
    ``path`` with :func:`scd2_apply`. Effectively-once for a single
    writer: the build is a pure function of the deduplicated event
    set, so checkpoint replays of unacknowledged batches re-derive
    the same buckets (the s16/s17 idempotence argument), and the
    partition swap is journaled crash-safe. ``counts``, if a list,
    collects each batch's rewritten-bucket count. Returns the
    started StreamingQuery."""
    spark = changes_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        n = scd2_apply(
            spark, path, batch_df, key_col, attr_cols, ts_col,
            n_buckets, bucket_expr,
        )
        if counts is not None:
            counts.append(n)

    return (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
