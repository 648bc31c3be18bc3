"""Time-decayed heavy hitters: trending keys with exponential decay.

The monitoring/trending primitive (which event types / domains /
users are hot NOW, with old traffic fading): score(key) =
Σ_hours n(key, hour) · 0.5^(Δhours), Δhours measured back from the
newest hour seen.

Design for both execution modes from one kernel:

- Batch (``decayed_counts``): one grouped (key, hour) count — the
  only corpus-sized shuffle — then the decay weight and re-aggregate
  run on the (keys × hours)-sized table with a 1-row broadcast of
  the reference hour. Decay base 0.5 per hour on purpose: 0.5^k is
  EXACT in IEEE doubles (dyadic), so the scoring is value-replayable
  across engines.
- Streaming (``decayed_hitters_sink``): each micro-batch APPENDS its
  (hour, key, n) partial counts — merge-on-read, no read-modify-write
  race, same pattern as ``windows.incremental_rollup_sink`` — and
  ``read_decayed`` applies the identical decay formula at read time.
  Appending never rewrites history; the decay reference shifts
  forward automatically as newer hours arrive.

N/A in the reference (no streaming layer); Structured-Streaming-first
engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hour_counts(
    df: DataFrame, key_col: str, ts_col: str = "ts"
) -> DataFrame:
    """(key, hour, n) partial counts — the mergeable state."""
    return df.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))


def _score(partials: DataFrame) -> DataFrame:
    """Decay-weight and merge (key, hour, n) partials into per-key
    scores. Runs entirely on state-sized data."""
    ref = partials.agg(F.max("hour").alias("ref_hour"))
    dh = (
        F.col("ref_hour").cast("long") - F.col("hour").cast("long")
    ) / F.lit(3600)
    return (
        partials.crossJoin(F.broadcast(ref))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") * F.pow(F.lit(0.5), dh)).alias("w"),
        )
        .groupBy("key")
        .agg(
            F.sum("n").alias("n_total"),
            F.round(F.sum("w"), 6).alias("score"),
        )
    )


def decayed_counts(
    df: DataFrame, key_col: str, ts_col: str = "ts", top_k: int = 20
) -> DataFrame:
    """Batch form: top-``top_k`` keys by decayed score (ties by key).

    Returns (key, n_total, score) ordered by (score desc, key).
    """
    return (
        _score(hour_counts(df, key_col, ts_col))
        .orderBy(F.desc("score"), "key")
        .limit(top_k)
    )


def decayed_hitters_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    ts_col: str = "ts",
):
    """Streaming form: write per-micro-batch hour partials under
    ``path`` (merge-on-read — the reader decays+merges). Each batch
    goes to its OWN ``batch=<id>`` subdirectory with overwrite: a
    replayed micro-batch (failure between sink write and checkpoint
    commit — foreachBatch is at-least-once) rewrites the same
    subdirectory instead of appending duplicate partials, making the
    sink idempotent on batch_id and the pipeline exactly-once
    end-to-end."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        hour_counts(batch_df, key_col, ts_col).write.mode(
            "overwrite"
        ).parquet(f"{path}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
    )


def read_decayed(
    spark: SparkSession, path: str, top_k: int = 20
) -> DataFrame:
    """Merge-on-read: decay+merge the stored partials — identical
    math to the batch form, so stream ≡ batch is testable exactly."""
    partials = spark.read.parquet(path)
    # partials may contain several rows per (key, hour) (one per
    # micro-batch); counts are mergeable so pre-combine first
    merged = partials.groupBy("key", "hour").agg(F.sum("n").alias("n"))
    return (
        _score(merged).orderBy(F.desc("score"), "key").limit(top_k)
    )
