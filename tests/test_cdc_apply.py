"""Streaming CDC apply (streaming.cdc): multi-microbatch change feed
applied to a parquet target ≡ one-shot apply of all changes; delete
arm; within-batch latest-per-key compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.streaming.cdc import apply_changes, cdc_apply_sink, compact_changes
from dislib_spark.streaming import await_drain


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
    await_drain(q, 180)
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


def test_erase_keys_escaped_partition_values(spark, tmp_path):
    """Partition values containing characters Spark percent-escapes
    in directory names (space, colon): the emptied-partition cleanup
    must match the on-disk ESCAPED directory by decoding it, not by
    assembling `col=value` strings — otherwise the emptied directory
    silently survives."""
    import os

    from dislib_spark.sources.merge import erase_keys_path

    rows = [
        (1, 7, "north region"),   # all rows erased -> dir removed
        (2, 8, "a:b"),            # partially erased -> rewritten
        (3, 7, "a:b"),
        (4, 9, "plain"),          # untouched
    ]
    df = spark.createDataFrame(rows, "id long, user_id long, seg string")
    path = str(tmp_path / "seg_mart")
    df.write.partitionBy("seg").parquet(path)
    escaped = [
        d for d in os.listdir(path) if d.startswith("seg=") and "%" in d
    ]
    # precondition: at least the colon value is percent-escaped on
    # disk (spaces are kept literal by Spark's partition escaping)
    assert escaped == ["seg=a%3Ab"], escaped

    keys = spark.createDataFrame([(7,)], "user_id long")
    assert erase_keys_path(spark, path, keys, "user_id", "seg") == 2
    got = spark.read.parquet(path)
    assert got.where(F.col("user_id") == 7).count() == 0
    assert {r["seg"] for r in got.select("seg").collect()} == {
        "a:b", "plain"
    }
    # the fully-erased escaped partition's directory is gone
    remaining = {
        d for d in os.listdir(path) if d.startswith("seg=")
    }
    assert not any("north" in d for d in remaining), remaining


def test_partition_swap_crash_recovery(spark, tmp_path):
    """A crash at ANY rename point of the replace_partitions_path
    swap rolls FORWARD on the next call: replay the journaled
    manifest from every intermediate state and assert the final
    table is the post-erase state — survivors never live only in
    memory, originals never deleted before replacements are
    durable."""
    import json
    import os
    import shutil

    from dislib_spark.sources.merge import (
        _MANIFEST,
        _recover_partition_swap,
        erase_keys_path,
    )

    rows = [
        (1, 7, "d1"), (2, 8, "d1"),   # d1 rewritten
        (3, 7, "d2"),                  # d2 emptied
        (4, 9, "d3"),                  # d3 untouched
    ]

    def build(p):
        df = spark.createDataFrame(
            rows, "id long, user_id long, day string"
        )
        df.write.mode("overwrite").partitionBy("day").parquet(str(p))

    def check_final(p):
        got = spark.read.parquet(str(p))
        assert {(r["id"], r["day"]) for r in got.collect()} == {
            (2, "d1"), (4, "d3")
        }
        assert not os.path.isdir(os.path.join(str(p), "day=d2"))
        assert not os.path.isdir(str(p) + ".__ptmp__")
        assert not os.path.isdir(str(p) + ".__pold__")

    keys = spark.createDataFrame([(7,)], "user_id long")

    # stage a completed tmp+manifest (the state right before the
    # first rename) by running a real erase on a sibling and copying
    # its artifacts is complex; instead simulate each crash point by
    # re-executing the plan manually and stopping early.
    base = tmp_path / "crash"
    build(base)
    # run a full erase once on a copy to harvest tmp + manifest
    full = tmp_path / "full"
    build(full)
    # intercept: write tmp + manifest exactly as the swap would
    from dislib_spark.sources import merge as M

    stored = spark.read.parquet(str(full))
    kept = stored.where(F.col("day").isin(["d1", "d2"])).where(
        F.col("user_id") != 7
    )
    tmp = str(full) + ".__ptmp__"
    old = str(full) + ".__pold__"
    kept.write.mode("overwrite").partitionBy("day").parquet(tmp)
    plan = [
        {"src": "day=d1", "tmp": "day=d1", "dest": "day=d1"},
        {"src": "day=d2", "tmp": None, "dest": "day=d2"},
    ]
    os.makedirs(old, exist_ok=True)
    with open(os.path.join(old, _MANIFEST), "w") as fh:
        json.dump(plan, fh)

    # crash point A: manifest written, zero renames done
    snapA_tmp = str(tmp_path / "A_tmp")
    snapA_old = str(tmp_path / "A_old")
    shutil.copytree(tmp, snapA_tmp)
    shutil.copytree(old, snapA_old)

    # crash point B: d1 moved out, nothing moved in
    os.rename(os.path.join(str(full), "day=d1"),
              os.path.join(old, "day=d1"))
    snapB = tmp_path / "B"
    shutil.copytree(str(full), str(snapB))
    shutil.copytree(tmp, str(snapB) + ".__ptmp__")
    shutil.copytree(old, str(snapB) + ".__pold__")

    # crash point C: d1 replacement moved in, d2 not yet moved out
    os.rename(os.path.join(tmp, "day=d1"),
              os.path.join(str(full), "day=d1"))
    snapC = tmp_path / "C"
    shutil.copytree(str(full), str(snapC))
    shutil.copytree(tmp, str(snapC) + ".__ptmp__")
    shutil.copytree(old, str(snapC) + ".__pold__")

    # recovery from A (via the public erase entry point — it must
    # first roll the interrupted swap forward, then find no residual)
    build(base)  # fresh identical table
    shutil.rmtree(str(base) + ".__ptmp__", ignore_errors=True)
    shutil.copytree(snapA_tmp, str(base) + ".__ptmp__")
    shutil.copytree(snapA_old, str(base) + ".__pold__")
    assert erase_keys_path(spark, str(base), keys, "user_id", "day") == 0
    check_final(base)

    # recovery from B and C via _recover_partition_swap directly
    for snap in (snapB, snapC):
        _recover_partition_swap(str(snap), "day")
        check_final(snap)

    # a bare tmp leftover with NO manifest (crash before journal) is
    # swept and the table left untouched
    leftover = tmp_path / "bare"
    build(leftover)
    os.makedirs(str(leftover) + ".__ptmp__/day=zz", exist_ok=True)
    M._recover_partition_swap(str(leftover), "day")
    assert not os.path.isdir(str(leftover) + ".__ptmp__")
    assert spark.read.parquet(str(leftover)).count() == 4

    # crash point D: swap COMMITTED (all renames done, manifest
    # removed) but the old/tmp cleanup rmtree was interrupted midway —
    # old still exists and has already lost some <part> subdirs. The
    # manifest-less .__pold__ must be treated as an inert leftover and
    # swept; before manifest-removal-as-commit, a surviving manifest
    # here would have renamed the landed replacement back OUT and
    # deleted it (silent loss of the partition's surviving rows).
    snapD = tmp_path / "D"
    shutil.copytree(str(snapB), str(snapD))  # snapB already recovered
    os.makedirs(str(snapD) + ".__pold__/day=d1")  # partial old remains
    os.makedirs(str(snapD) + ".__ptmp__", exist_ok=True)
    _recover_partition_swap(str(snapD), "day")
    check_final(snapD)

    # a crash DURING the journal write leaves only a truncated
    # _MANIFEST.json.tmp (the atomic-rename never ran): no renames can
    # have happened, so the whole .__pold__ is swept without parsing
    trunc = tmp_path / "trunc"
    build(trunc)
    os.makedirs(str(trunc) + ".__pold__", exist_ok=True)
    with open(str(trunc) + ".__pold__/" + _MANIFEST + ".tmp", "w") as fh:
        fh.write('[{"src": "day=d1", "tm')  # truncated mid-write
    M._recover_partition_swap(str(trunc), "day")
    assert not os.path.isdir(str(trunc) + ".__pold__")
    assert spark.read.parquet(str(trunc)).count() == 4


def test_erasure_sink_stream_equals_batch(spark, tmp_path):
    """s16's kernel: forget-me keys drained as TWO micro-batches
    (maxFilesPerTrigger=1) through the foreachBatch erasure sink must
    leave exactly the table a one-shot batch erase leaves — erasure is
    idempotent and batch-associative — and the per-batch rewritten-
    partition counts are collected."""
    from dislib_spark.sources.merge import erase_keys_path
    from dislib_spark.streaming.cdc import erasure_sink

    rows = [
        (1, 7, "d1"), (2, 8, "d1"), (3, 9, "d2"),
        (4, 7, "d2"), (5, 10, "d3"),
    ]
    df = spark.createDataFrame(rows, "id long, user_id long, day string")

    streamed = str(tmp_path / "streamed")
    batch = str(tmp_path / "batch")
    df.write.partitionBy("day").parquet(streamed)
    df.write.partitionBy("day").parquet(batch)

    feed = str(tmp_path / "feed")
    spark.createDataFrame([(7,)], "user_id long").coalesce(1).write.parquet(feed)
    spark.createDataFrame([(10,)], "user_id long").coalesce(1).write.mode(
        "append"
    ).parquet(feed)

    counts: list[int] = []
    q = erasure_sink(
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed),
        streamed,
        str(tmp_path / "ckpt"),
        "user_id",
        "day",
        counts=counts,
        availableNow=True,
    )
    await_drain(q, 120)
    keys = spark.createDataFrame([(7,), (10,)], "user_id long")
    erase_keys_path(spark, batch, keys, "user_id", "day")

    got = {tuple(r) for r in spark.read.parquet(streamed).collect()}
    want = {tuple(r) for r in spark.read.parquet(batch).collect()}
    assert got == want
    assert {r[1] for r in got} == {8, 9}
    assert len(counts) == 2 and sum(counts) == 3  # d1+d2, then d3


def test_enforce_retention_path(spark, tmp_path):
    """enforce_retention_path classifies and executes in one pass:
    whole-expired days dropped (directory gone), mixed days rewritten
    to survivors only, clean days byte-untouched; returns the
    (n_dropped, n_rewritten) counts; a second enforcement at the same
    watermark is a no-op; and enforcement is watermark-monotone
    (tick at t1 then t2 ≡ one-shot at t2)."""
    import os

    from dislib_spark.sources.merge import enforce_retention_path

    # per-type TTL: 'a' keeps 5 days, others 10
    ttl = F.when(F.col("typ") == "a", 5).otherwise(10)
    rows = [
        # day d-12: all rows past both TTLs -> DROP
        (1, "a", "2024-01-01"), (2, "b", "2024-01-01"),
        # day d-7: 'a' expired (age 7 > 5), 'b' kept -> REWRITE
        (3, "a", "2024-01-06"), (4, "b", "2024-01-06"),
        # day d-1: nothing expired -> KEEP
        (5, "a", "2024-01-12"), (6, "b", "2024-01-12"),
    ]
    df = spark.createDataFrame(rows, "id long, typ string, day string")
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
    assert enforce_retention_path(
        spark, path, "day", ttl, "2024-01-13"
    ) == (1, 1)
    got = spark.read.parquet(path)
    assert {(r["id"],) for r in got.select("id").collect()} == {
        (4,), (5,), (6,)
    }
    assert not os.path.isdir(os.path.join(path, "day=2024-01-01"))
    # KEEP day files byte-identical
    after = files(path)
    for f, mtime in before.items():
        if "day=2024-01-12" in f:
            assert f in after and after[f] == mtime
    # idempotent at the same watermark
    assert enforce_retention_path(
        spark, path, "day", ttl, "2024-01-13"
    ) == (0, 0)

    # monotonicity: t1 then t2 == one-shot at t2
    p2 = str(tmp_path / "ticked")
    p3 = str(tmp_path / "oneshot")
    df.write.partitionBy("day").parquet(p2)
    df.write.partitionBy("day").parquet(p3)
    enforce_retention_path(spark, p2, "day", ttl, "2024-01-08")
    enforce_retention_path(spark, p2, "day", ttl, "2024-01-13")
    enforce_retention_path(spark, p3, "day", ttl, "2024-01-13")
    a = {tuple(r) for r in spark.read.parquet(p2).collect()}
    b = {tuple(r) for r in spark.read.parquet(p3).collect()}
    assert a == b


def test_retention_sink_stream_equals_batch(spark, tmp_path):
    """s17's kernel: watermark ticks drained as TWO micro-batches
    (maxFilesPerTrigger=1) through the foreachBatch retention sink
    must leave exactly the table a one-shot enforcement at the final
    watermark leaves, and the per-batch (dropped, rewritten) counts
    are collected per tick."""
    from dislib_spark.sources.merge import enforce_retention_path
    from dislib_spark.streaming.cdc import retention_sink

    ttl = F.when(F.col("typ") == "a", 5).otherwise(10)
    rows = [
        (1, "a", "2024-01-01"), (2, "b", "2024-01-01"),
        (3, "a", "2024-01-06"), (4, "b", "2024-01-06"),
        (5, "a", "2024-01-12"), (6, "b", "2024-01-12"),
    ]
    df = spark.createDataFrame(rows, "id long, typ string, day string")
    mpath = str(tmp_path / "mart")
    feed = str(tmp_path / "ticks")
    df.write.partitionBy("day").parquet(mpath)
    spark.createDataFrame(
        [("2024-01-08",)], "as_of string"
    ).coalesce(1).write.mode("overwrite").parquet(feed)
    spark.createDataFrame(
        [("2024-01-13",)], "as_of string"
    ).coalesce(1).write.mode("append").parquet(feed)

    counts: list[tuple[int, int]] = []
    q = retention_sink(
        spark.readStream.schema("as_of string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed),
        mpath,
        str(tmp_path / "ckpt"),
        "day",
        ttl,
        counts=counts,
        availableNow=True,
    )
    await_drain(q, 180)
    assert len(counts) == 2

    ref = str(tmp_path / "ref")
    df.write.partitionBy("day").parquet(ref)
    enforce_retention_path(spark, ref, "day", ttl, "2024-01-13")

    def state(p):
        return {
            tuple(r)
            for r in spark.read.parquet(p)
            .select("id", "typ", F.col("day").cast("string"))
            .collect()
        }

    assert state(mpath) == state(ref) == {
        (4, "b", "2024-01-06"),
        (5, "a", "2024-01-12"),
        (6, "b", "2024-01-12"),
    }


def test_scd2_apply_stream_equals_batch_and_scoped(spark, tmp_path):
    """scd2_apply: (a) multi-batch fold (with OUT-OF-ORDER second
    batch) equals the one-shot scd2_build over the union; (b) a
    follow-up single-key batch rewrites only that key's bucket —
    every other bucket's files stay byte-identical; (c) re-applying
    an already-applied batch is a content no-op (checkpoint-replay
    idempotence)."""
    import os

    from dislib_spark.streaming.cdc import scd2_apply, scd2_build

    rows = [
        (u, t, s)
        for u in range(40)
        for s, t in [(100 + u, "a"), (200 + u, "b"), (300 + u, "a")]
    ]
    ev = spark.createDataFrame(rows, "user_id long, et string, ts_s long")
    # batch 1 = the LATER half of events, batch 2 = the earlier half:
    # the second apply must splice history, not just close open rows
    b1 = ev.where(F.col("ts_s") >= 200)
    b2 = ev.where(F.col("ts_s") < 200)
    path = str(tmp_path / "dim")
    scd2_apply(spark, path, b1, "user_id", ["et"], "ts_s", n_buckets=8)
    scd2_apply(spark, path, b2, "user_id", ["et"], "ts_s", n_buckets=8)

    def canon(df):
        return sorted(
            (r["user_id"], r["et"], r["valid_from"], r["valid_to"],
             r["version"])
            for r in df.collect()
        )

    got = canon(spark.read.parquet(path))
    want = canon(scd2_build(ev, "user_id", ["et"], "ts_s"))
    assert got == want

    def files(p):
        out = {}
        for root, _, names in os.walk(p):
            for n in names:
                if n.endswith(".parquet"):
                    f = os.path.join(root, n)
                    out[f] = os.path.getmtime(f)
        return out

    before = files(path)
    one = spark.createDataFrame(
        [(7, "c", 400)], "user_id long, et string, ts_s long"
    )
    n = scd2_apply(spark, path, one, "user_id", ["et"], "ts_s", n_buckets=8)
    assert n == 1
    after = files(path)
    hit_bucket = spark.read.parquet(path).where(
        (F.col("user_id") == 7) & (F.col("et") == "c")
    ).select("bucket").first()["bucket"]
    untouched = 0
    for f, mtime in before.items():
        bk = int(f.split("bucket=")[1].split(os.sep)[0])
        if bk != hit_bucket:
            assert f in after and after[f] == mtime, f
            untouched += 1
    assert untouched > 0
    # user 7 now has 4 versions, the new one open
    u7 = spark.read.parquet(path).where(F.col("user_id") == 7)
    assert u7.count() == 4
    assert u7.where(F.col("valid_to") == 2**62).count() == 1

    # (c) replaying an already-folded batch changes nothing
    st = canon(spark.read.parquet(path))
    scd2_apply(spark, path, b2, "user_id", ["et"], "ts_s", n_buckets=8)
    assert canon(spark.read.parquet(path)) == st
