"""Decayed heavy hitters: stream ≡ batch, decay monotonicity, and
dyadic exactness of the weighting."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dislib_spark.streaming import await_drain
from dislib_spark.streaming.decay import (
    decayed_counts,
    decayed_hitters_sink,
    read_decayed,
)
from dislib_spark.tables import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_decayed_hitters_stream_equals_batch(spark, tmp_path):
    """Drain events in multiple micro-batches through the append-only
    sink; the merge-on-read score must equal the one-shot batch
    score exactly (counts merge associatively, the decay reference is
    recomputed at read)."""
    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = str(tmp_path / "hitters")
    q = decayed_hitters_sink(
        stream, sink, str(tmp_path / "ckpt"), "user_id"
    ).trigger(availableNow=True).start()
    await_drain(q, 180)
    # multi-batch appends: more partial rows than distinct (key, hour)
    partials = spark.read.parquet(sink)
    merged = partials.groupBy("key", "hour").count()
    assert partials.count() > merged.count()

    got = [
        (r.key, r.n_total, r.score)
        for r in read_decayed(spark, sink, top_k=50).collect()
    ]
    want = [
        (r.key, r.n_total, r.score)
        for r in decayed_counts(ev, "user_id", top_k=50).collect()
    ]
    assert got == want

    # replay idempotence: re-writing a batch's own subdirectory (what
    # a recovered foreachBatch does) must not change the result
    from dislib_spark.streaming.decay import hour_counts

    first_batch = spark.read.parquet(src).limit(100)
    hour_counts(first_batch, "user_id").write.mode("overwrite").parquet(
        sink + "/batch=0"
    )
    hour_counts(first_batch, "user_id").write.mode("overwrite").parquet(
        sink + "/batch=0"
    )
    again = [
        (r.key, r.n_total, r.score)
        for r in read_decayed(spark, sink, top_k=50).collect()
    ]
    assert len(again) == len(got)


def test_decay_weights_are_exact_and_monotone(spark):
    """Hand-built fixture: a key with all-recent traffic must outrank
    one with more but older traffic; scores equal the closed form."""
    t0 = datetime.datetime(2024, 1, 10, 12, 0, 0)
    rows = (
        # "fresh": 4 events in the newest hour
        [("fresh", t0)] * 4
        # "stale": 16 events 6 hours earlier → 16 * 0.5^6 = 0.25
        + [("stale", t0 - datetime.timedelta(hours=6))] * 16
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        r.key: (r.n_total, r.score)
        for r in decayed_counts(df, "k", ts_col="ts", top_k=10).collect()
    }
    assert got["fresh"] == (4, 4.0)
    assert got["stale"] == (16, 0.25)
