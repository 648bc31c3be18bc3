"""Streaming CDC apply (streaming.cdc): multi-microbatch change feed
applied to a parquet target ≡ one-shot apply of all changes; delete
arm; within-batch latest-per-key compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.streaming.cdc import apply_changes, cdc_apply_sink, compact_changes


def _changes(spark):
    # (k, v, op, ts): two updates for k=1 in one batch (compaction),
    # an insert, a delete, and an update-after-delete for k=3
    rows = [
        (1, "a1", "U", 10),
        (1, "a2", "U", 20),  # later ts wins
        (2, "b1", "U", 11),
        (3, "c1", "U", 12),
        (3, None, "D", 30),  # delete k=3 later
        (4, "d1", "U", 13),
    ]
    return spark.createDataFrame(rows, "k long, v string, op string, ts long")


def test_compact_changes_latest_wins(spark):
    got = {
        r["k"]: (r["v"], r["ts"])
        for r in compact_changes(_changes(spark), ["k"], "ts").collect()
    }
    assert got[1] == ("a2", 20)
    assert got[3] == (None, 30)
    assert len(got) == 4


def _final_state(spark, path):
    return {
        r["k"]: r["v"] for r in spark.read.parquet(path).collect()
    }


def test_stream_apply_equals_batch_apply(spark, tmp_path):
    ch = _changes(spark)
    src = str(tmp_path / "src")
    # one file per change row → 6 micro-batches with maxFilesPerTrigger=1,
    # ordered by ts so the feed replays causally
    ch.orderBy("ts").coalesce(1).write.parquet(src)  # seed dir schema
    import shutil

    shutil.rmtree(src)
    for i, row in enumerate(ch.orderBy("ts").collect()):
        spark.createDataFrame([row], ch.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(ch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    tgt_stream = str(tmp_path / "tgt_stream")
    q = cdc_apply_sink(
        stream,
        tgt_stream,
        str(tmp_path / "ckpt"),
        ["k"],
        ts_col="ts",
        delete_condition=F.col("op") == "D",
        availableNow=True,
    )
    q.awaitTermination(180)

    tgt_batch = str(tmp_path / "tgt_batch")
    apply_changes(
        spark, tgt_batch, ch, ["k"], "ts",
        delete_condition=F.col("op") == "D",
    )
    got_stream = _final_state(spark, tgt_stream)
    got_batch = _final_state(spark, tgt_batch)
    assert got_stream == got_batch == {1: "a2", 2: "b1", 4: "d1"}


def test_apply_changes_upsert_then_delete(spark, tmp_path):
    path = str(tmp_path / "tbl")
    first = spark.createDataFrame(
        [(1, "x", "U", 1), (2, "y", "U", 1)], "k long, v string, op string, ts long"
    )
    apply_changes(spark, path, first, ["k"], "ts", F.col("op") == "D")
    second = spark.createDataFrame(
        [(1, None, "D", 2), (3, "z", "U", 2)], "k long, v string, op string, ts long"
    )
    apply_changes(spark, path, second, ["k"], "ts", F.col("op") == "D")
    assert _final_state(spark, path) == {2: "y", 3: "z"}


def test_erase_keys_partition_scoped(spark, tmp_path):
    """x103's erasure kernel: (a) erased keys leave zero residual
    rows; (b) only partitions holding erased rows are rewritten —
    untouched partition files stay byte-identical; (c) a partition
    whose every row is erased has its directory removed; (d) the
    returned count equals the touched-partition fan-out."""
    import os

    from dislib_spark.sources.merge import erase_keys_path

    rows = [
        # part p0: users 1,2; p1: user 1 only; p2: user 3 only
        (10, 1, "p0"), (11, 2, "p0"),
        (12, 1, "p1"),
        (13, 3, "p2"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, day string")
    path = str(tmp_path / "mart")
    df.write.partitionBy("day").parquet(path)

    def files(p):
        out = {}
        for root, _, names in os.walk(p):
            for n in names:
                if n.endswith(".parquet"):
                    f = os.path.join(root, n)
                    out[f] = os.path.getmtime(f)
        return out

    before = files(path)
    keys = spark.createDataFrame([(1,)], "user_id long")
    n = erase_keys_path(spark, path, keys, "user_id", "day")
    assert n == 2  # p0 and p1 touched
    got = spark.read.parquet(path)
    assert got.where(F.col("user_id") == 1).count() == 0
    assert got.count() == 2  # user 2 and user 3 survive
    # (b) untouched p2 files byte-identical
    after = files(path)
    for f, mtime in before.items():
        if "day=p2" in f:
            assert f in after and after[f] == mtime
    # (c) p1 (all rows erased) directory removed
    assert not os.path.isdir(os.path.join(path, "day=p1"))
    assert os.path.isdir(os.path.join(path, "day=p0"))
    # no-op erase returns 0 and changes nothing
    assert erase_keys_path(
        spark, path, spark.createDataFrame([(99,)], "user_id long"),
        "user_id", "day",
    ) == 0
