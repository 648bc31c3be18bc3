"""Structured Streaming operators over the events schema.

N/A in the reference (SURVEY.md §2.10 — dislib has no streaming
layer); required by the engine's north star. Everything here is
built-in Structured Streaming: event-time windows + watermarks,
late-data drop, streaming dedup, and a stateful custom operator via
``applyInPandasWithState``.

Batch/stream parity: each transformation takes a DataFrame that may
be batch (``spark.read``) or streaming (``spark.readStream``) — the
SAME code path, so the batch oracle (q15) certifies the streaming
logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _watermarked(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """withWatermark, coercing TIMESTAMP_NTZ event time to TIMESTAMP —
    watermarks require the LTZ type (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    and parquet written with nanos/NTZ timestamps reads back as NTZ."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts + sums with a watermark
    (late rows beyond the watermark are dropped by the engine)."""
    src = events
    if events.isStreaming:
        src = _watermarked(events, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Decimal sum → double: exact for the 2-decimal event
            # values, so the result is independent of partial-sum
            # ordering (batch AND streaming incremental order).
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "segment",
) -> DataFrame:
    """Stream-static enrichment join + tumbling rollup: each event is
    joined to a (small) static dimension table, then counted per
    (window, ``group_col``).

    The canonical streaming-ETL shape: the static side is broadcast
    to every task of every micro-batch (no stateful join, no
    watermark needed on the dim side — Structured Streaming replans
    the static side per batch). Works identically on a batch
    DataFrame, which is what the s06 oracle certifies.
    """
    src = events
    if events.isStreaming:
        src = _watermarked(events, ts_col, watermark)
    joined = src.join(F.broadcast(dim), on=on, how="inner")
    return (
        joined.groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            group_col,
            "n",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    src = _watermarked(events, ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(
            # exact decimal sum / count: deterministic under any
            # partial-agg ordering (see tumbling_counts)
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("w.start").alias("w_start"), "event_type", "avg_value", "n"
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (gap-based)."""
    src = _watermarked(events, ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window(ts_col, gap).alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup bounded by the watermark
    (dropDuplicatesWithinWatermark); batch mode falls back to plain
    dropDuplicates — same keys, same semantics within the horizon."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return _watermarked(events, ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def running_user_stats(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Custom stateful operator: per-user running (count, sum, max)
    via applyInPandasWithState — the engine's §2.10
    stateful-UDF surface. Streaming only."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        cnt, total, mx = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((cnt, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [cnt],
                "total": [total],
                "vmax": [mx],
            }
        )

    return (
        _watermarked(events, ts_col, "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n long, total double, vmax double",
            stateStructType="n long, total double, vmax double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rollup_partials(
    df: DataFrame,
    grain: str = "day",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Mergeable time-rollup partials: (bucket, keys) → (n, decimal
    sum). Shared by the batch rollup (x45/x47) and the streaming sink
    below — merge of any partition of the input equals the full
    aggregate, because counts and decimal sums are associative."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.groupBy(
        F.date_trunc(grain, ts_col).alias("bucket"), *key_cols
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sv"),
    )


def incremental_rollup_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    grain: str = "day",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    **trigger,
):
    """Streaming continuous-aggregate maintenance, merge-on-read:
    every micro-batch APPENDS its rollup partials to ``path``;
    ``read_rollup`` re-aggregates them. Append-only means no
    read-modify-write race and object-store-safe commits (the
    lakehouse MERGE INTO equivalent without a table format);
    periodic compaction is ``read_rollup(...).write`` — exactly the
    x47 merge, which the oracle proves equals a full recompute.

    Returns the started StreamingQuery (use
    ``trigger(availableNow=True)`` kwargs for batch-drain tests).
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            rollup_partials(batch_df, grain, ts_col, key_cols, value_col)
            .write.mode("append")
            .parquet(path)
        )

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_rollup(spark, path: str, key_cols: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Merge the appended partials back to the exact rollup: one
    dimension-sized aggregation over the partials table (never the
    raw events)."""
    p = spark.read.parquet(path)
    return p.groupBy("bucket", *key_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sv").cast("double").alias("sum_value"),
    )


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL join (Spark's native
    two-stream state-bounded join): each right-side event matches
    left-side events of the same key whose time precedes it by at
    most ``window``. On streaming inputs both sides get watermarks —
    the range condition plus watermarks lets Spark evict join state
    older than window+watermark, so state is bounded by the traffic
    inside that horizon, never the stream history. On batch inputs
    the IDENTICAL join runs without watermarks (parity pinned in
    tests/test_io_streaming_multimodal.py).

    Event times are truncated to whole seconds BEFORE the join: the
    fixture parquet carries nanosecond timestamps whose sub-second
    tail differs across engine decoders, so a raw-timestamp window
    boundary would be engine-dependent; whole seconds are exact
    integers everywhere. Returns (on, c_ts, p_ts, lag_s).
    """
    c = clicks.select(
        F.col(on), F.date_trunc("second", F.col(ts_col)).alias("c_ts")
    )
    p = purchases.select(
        F.col(on), F.date_trunc("second", F.col(ts_col)).alias("p_ts")
    )
    if clicks.isStreaming:
        c = _watermarked(c, "c_ts", watermark)
    if purchases.isStreaming:
        p = _watermarked(p, "p_ts", watermark)
    return (
        c.join(p, on)
        .where(
            (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window}"))
        )
        .select(
            on,
            "c_ts",
            "p_ts",
            (F.col("p_ts") - F.col("c_ts")).cast("long").alias("lag_s"),
        )
    )


def stream_stream_left_join(
    clicks: DataFrame,
    purchases: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    carry: tuple = ("event_id",),
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join — the
    unmatched-emission semantics :func:`stream_stream_join` (inner)
    doesn't cover: matched (click, purchase) pairs emit on arrival;
    a click with NO same-key purchase inside ``(c_ts, c_ts+window]``
    emits ONCE with null right-side columns when the global watermark
    passes ``c_ts + window`` and its state expires (the state-TTL
    contract — join state is bounded by window+watermark traffic,
    and every click is accounted for exactly once as matched rows or
    one null row).

    Spark requires the time-range predicate INSIDE the outer join
    condition (a post-filter would make null emission undecidable),
    so the range is part of the ON clause here, unlike the inner
    form's post-where. On batch inputs the identical left join runs
    without watermarks; streaming ≡ batch after a watermark-flushing
    batch (pinned in tests/test_io_streaming_multimodal.py — with a
    finite stream the last clicks' state never expires until a later
    batch advances the watermark past them).

    Event times are truncated to whole seconds (engine-exact, see
    :func:`stream_stream_join`). Returns (on, *carry, c_ts, p_ts,
    lag_s) with p_ts/lag_s null on unmatched rows.
    """
    c = clicks.select(
        F.col(on),
        *[F.col(x) for x in carry],
        F.date_trunc("second", F.col(ts_col)).alias("c_ts"),
    )
    p = purchases.select(
        F.col(on).alias("_p_key"),
        F.date_trunc("second", F.col(ts_col)).alias("p_ts"),
    )
    if clicks.isStreaming:
        c = _watermarked(c, "c_ts", watermark)
    if purchases.isStreaming:
        p = _watermarked(p, "p_ts", watermark)
    cond = (
        (F.col(on) == F.col("_p_key"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond, "left_outer").select(
        on,
        *carry,
        "c_ts",
        "p_ts",
        (F.col("p_ts") - F.col("c_ts")).cast("long").alias("lag_s"),
    )


def dedup_then_tumbling_counts(
    events: DataFrame,
    keys: list[str] | None = None,
    window: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """CHAINED stateful operators in one streaming query: watermark-
    bounded exact dedup (dropDuplicatesWithinWatermark) feeding a
    tumbling window count — the at-least-once ingestion cleanup every
    Kafka-fed pipeline wants fused with its rollup instead of paying
    a second topic hop. Spark supports multiple stateful operators in
    append mode (the dedup's event-time survives into the window
    agg); batch mode falls back to dropDuplicates + the same rollup,
    so streaming ≡ batch within the horizon (parity pytest runs the
    real availableNow stream with sentinel watermark flushes).
    Returns (w_start, w_end, event_type, n)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        src = _watermarked(events, ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    else:
        src = events.dropDuplicates(keys)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
    )
