"""Sources/sinks, streaming windows (batch-parity + a real stream),
multimodal binary plumbing."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

import dislib_spark as ds
from dislib_spark.streaming import await_drain
from dislib_spark.sources import (
    load_npy_file,
    load_npy_files,
    load_parquet,
    load_svmlight_file,
    load_txt_file,
    save_parquet,
    save_txt,
)
from dislib_spark.streaming import (
    dedup_within_watermark,
    session_windows,
    sliding_avg,
    tumbling_counts,
)
from dislib_spark.multimodal import decode_features, fake_decode, frame_sample
from dislib_spark.tables import load_table
from tests.conftest import SF_SMOKE

RNG = np.random.RandomState(21)


def test_txt_roundtrip(spark, tmp_path):
    A = RNG.rand(20, 3)
    np.savetxt(tmp_path / "m.csv", A, delimiter=",")
    x = load_txt_file(spark, str(tmp_path / "m.csv"))
    assert x.shape == (20, 3)
    assert np.allclose(np.sort(x.collect(), 0), np.sort(A, 0), atol=1e-9)

    out = tmp_path / "out_txt"
    save_txt(ds.array(A, spark), str(out))
    back = load_txt_file(spark, str(out))
    assert np.allclose(np.sort(back.collect(), 0), np.sort(A, 0), atol=1e-9)


def test_parquet_roundtrip(spark, tmp_path):
    A = RNG.rand(15, 4)
    a = ds.array(A, spark)
    save_parquet(a, str(tmp_path / "arr.parquet"))
    back = load_parquet(spark, str(tmp_path / "arr.parquet"))
    assert back.shape == (15, 4)
    assert np.allclose(back.collect(), A)


def test_npy_loaders(spark, tmp_path):
    A = RNG.rand(10, 6)
    np.save(tmp_path / "one.npy", A)
    x = load_npy_file(spark, str(tmp_path / "one.npy"))
    assert x.shape == (10, 6)
    assert np.allclose(x.collect(), A)

    d = tmp_path / "many"
    d.mkdir()
    parts = [RNG.rand(4, 3), RNG.rand(5, 3), RNG.rand(2, 3)]
    for i, p in enumerate(parts):
        np.save(d / f"{i}.npy", p)
    stacked = load_npy_files(spark, str(d))
    assert stacked.shape == (11, 3)
    assert np.allclose(stacked.collect(), np.vstack(parts))


def test_svmlight_loader(spark, tmp_path):
    lines = ["1 1:0.5 3:2.0", "0 2:1.5", "1 1:1.0 2:1.0 3:1.0"]
    p = tmp_path / "data.svm"
    p.write_text("\n".join(lines) + "\n")
    x, y = load_svmlight_file(spark, str(p), n_features=3)
    assert x.shape == (3, 3)
    X = x.collect()
    expected = np.array([[0.5, 0, 2.0], [0, 1.5, 0], [1.0, 1.0, 1.0]])
    assert np.allclose(np.sort(X, 0), np.sort(expected, 0))
    assert sorted(y.collect().ravel()) == [0.0, 1.0, 1.0]


def test_streaming_batch_parity(spark):
    """Window transforms run identically on a batch frame (q15-style
    oracle certifies the logic)."""
    ev = load_table(spark, SF_SMOKE, "events")
    t = tumbling_counts(ev)
    rows = t.collect()
    assert len(rows) > 0
    assert {"w_start", "w_end", "event_type", "n", "sum_value"} <= set(t.columns)

    s = sliding_avg(ev).collect()
    assert len(s) >= len(rows)  # sliding windows ⊇ tumbling

    sw = session_windows(ev).collect()
    assert len(sw) > 0

    d = dedup_within_watermark(ev)
    assert d.count() == ev.count()  # event_id unique already


def test_streaming_real_stream(spark, tmp_path):
    """Real readStream → window agg → memory sink (checks the
    streaming plan is valid, watermark included)."""
    ev = load_table(spark, SF_SMOKE, "events")
    src_dir = str(tmp_path / "stream_src")
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    agg = tumbling_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("t_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 120)
    # append mode only emits closed windows (watermark passed), so
    # just assert the stream ran and the table exists
    spark.sql("SELECT * FROM t_counts").collect()
    assert q.lastProgress is not None


def test_multimodal_decode(spark):
    rows = [(i, bytes([i] * 32)) for i in range(6)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    feats = decode_features(media, codec=fake_decode, out_side=4)
    got = feats.collect()
    assert len(got) == 6
    assert all(len(r["features"]) == 16 for r in got)
    # deterministic per content
    again = {r["media_id"]: r["features"] for r in feats.collect()}
    first = {r["media_id"]: r["features"] for r in got}
    assert again == first

    frames = frame_sample(media, n_frames=3)
    fr = frames.collect()
    assert len(fr) == 18
    assert all(len(r["features"]) == 64 for r in fr)


def test_mdcrd_loader(spark, tmp_path):
    # 2 snapshots × 4 atoms × 3 coords, 80-col style rows
    from dislib_spark.sources import load_mdcrd_file

    vals = np.arange(24, dtype=float) / 10
    lines = ["TITLE"]
    flat = vals.tolist()
    for i in range(0, len(flat), 6):
        lines.append(" ".join(f"{v:8.3f}" for v in flat[i : i + 6]))
    p = tmp_path / "traj.mdcrd"
    p.write_text("\n".join(lines) + "\n")
    x = load_mdcrd_file(spark, str(p), n_atoms=4)
    assert x.shape == (2, 12)
    assert np.allclose(x.collect().ravel(), vals, atol=1e-3)


def test_sparse_array(spark, tmp_path):
    from dislib_spark.array.sparse import (
        SparseDsArray,
        from_scipy_like,
        load_svmlight_sparse,
    )

    rows = [
        (0, [0, 3], [1.0, 2.0]),
        (1, [1], [5.0]),
        (2, [], []),
        (3, [0, 1, 2, 3], [1.0, 1.0, 1.0, 1.0]),
    ]
    x = from_scipy_like(rows, (4, 4), spark)
    D = np.zeros((4, 4))
    D[0, 0], D[0, 3], D[1, 1] = 1.0, 2.0, 5.0
    D[3] = 1.0
    assert np.allclose(x.collect(), D)
    assert x.nnz() == 7
    assert np.allclose((x * 2.0).collect(), D * 2)
    assert np.allclose(x.sum(0).collect().ravel(), D.sum(0))
    assert np.allclose(x.sum(1).collect().ravel(), D.sum(1))
    assert np.allclose(x.norm(0).collect().ravel(), np.linalg.norm(D, axis=0))
    assert np.allclose(x.to_dense().collect(), D)

    # sparse svmlight path
    p = tmp_path / "s.svm"
    p.write_text("1 1:0.5 3:2.0\n0 2:1.5\n1 1:1.0 2:1.0 3:1.0\n")
    xs, ys = load_svmlight_sparse(spark, str(p), n_features=3)
    assert xs.shape == (3, 3)
    assert xs.nnz() == 6
    expected = np.array([[0.5, 0, 2.0], [0, 1.5, 0], [1.0, 1.0, 1.0]])
    assert np.allclose(np.sort(xs.collect(), 0), np.sort(expected, 0))
    ml = xs.to_ml_df()
    assert ml.count() == 3
    assert str(ml.schema["_v"].dataType) == "VectorUDT()"


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Watermark semantics end-to-end: rows older than the watermark
    horizon arriving in a later micro-batch are dropped from append-
    mode windowed output."""
    from datetime import datetime

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_batch(rows, mode):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(src)

    out_dir = str(tmp_path / "late_out")

    def run_once(qname):
        # memory sink can't recover from a checkpoint; parquet sink can
        from dislib_spark.streaming import tumbling_counts

        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            tumbling_counts(stream, window="1 hour", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        await_drain(q, 120)
    # batch 1: events up to 12:00 — watermark advances to 11:00
    write_batch(
        [
            (1, datetime(2025, 1, 1, 8, 30), 1, "a", 1.0, "{}"),
            (2, datetime(2025, 1, 1, 12, 0), 1, "a", 1.0, "{}"),
        ],
        "overwrite",
    )
    run_once("late1")
    # batch 2: a VERY late row (8:40, watermark is 11:00) + a fresh row
    write_batch(
        [
            (3, datetime(2025, 1, 1, 8, 40), 1, "a", 1.0, "{}"),
            (4, datetime(2025, 1, 1, 15, 0), 1, "a", 1.0, "{}"),
        ],
        "append",
    )
    run_once("late2")

    rows = spark.read.parquet(out_dir).collect()
    # the 8:00 window was finalized by batch 1's watermark: the late
    # 8:40 row must NOT re-emit or grow the 8:00 window beyond count 1
    eight = [r for r in rows if r["w_start"].hour == 8]
    assert all(r["n"] == 1 for r in eight)


def test_stream_stream_interval_join(spark, tmp_path):
    """Two real streams joined with interval_join + watermark must
    emit exactly the batch join's matches (inner join emits on
    arrival; the watermark only bounds state)."""
    from pyspark.sql import functions as F

    from dislib_spark.temporal import interval_join

    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    cd, pd_ = str(tmp_path / "c"), str(tmp_path / "p")
    c.write.mode("overwrite").parquet(cd)
    p.write.mode("overwrite").parquet(pd_)
    cs = spark.readStream.schema(c.schema).parquet(cd)
    ps = spark.readStream.schema(p.schema).parquet(pd_)
    j = interval_join(
        cs, ps, on="user_id", left_time="ts", right_time="p_ts",
        upper="30 minutes", watermark="2 hours",
    )
    q = (
        j.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 120)
    got = spark.sql("SELECT COUNT(*) AS n FROM ss_join").first()["n"]
    expect = interval_join(
        c, p, on="user_id", left_time="ts", right_time="p_ts",
        upper="30 minutes",
    ).count()
    assert got == expect and expect > 0


def test_transform_with_state_v2(spark, tmp_path):
    """transformWithState (Spark 4 stateful v2) running stats agree
    with the applyInPandasWithState form on the same stream. Runs
    against the installed protobuf wheel OR the repo-vendored runtime
    (ensure_protobuf ships it to workers via addPyFile); skips only
    when neither exists."""
    from dislib_spark.streaming.stateful import (
        ensure_protobuf,
        running_user_stats_v2,
    )
    from dislib_spark.streaming.windows import running_user_stats

    if not ensure_protobuf(spark):
        with pytest.raises(ImportError, match="transformWithState"):
            running_user_stats_v2(
                spark.readStream.schema(
                    load_table(spark, SF_SMOKE, "events").schema
                ).parquet(str(tmp_path))
            )
        pytest.skip("no protobuf runtime (wheel or vendored) available")

    ev = load_table(spark, SF_SMOKE, "events")
    src_dir = str(tmp_path / "tws_src")
    ev.write.mode("overwrite").parquet(src_dir)

    # TWS state (multiple column families) needs the RocksDB provider
    # (HDFSBacked raises STATE_STORE_MULTIPLE_COLUMN_FAMILIES);
    # rocksdbjni ships inside the spark jars. Scoped to this test.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    results = {}
    try:
        for name, fn in (
            ("v2", running_user_stats_v2),
            ("v1", running_user_stats),
        ):
            stream = spark.readStream.schema(ev.schema).parquet(src_dir)
            q = (
                fn(stream)
                .writeStream.format("memory")
                .queryName(f"tws_{name}")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            await_drain(q, 120)
            rows = spark.sql(
                f"SELECT user_id, n, total, vmax FROM tws_{name}"
            ).collect()
            # update mode may emit a row per micro-batch per key; keep
            # the final (max-n) row per user
            final = {}
            for r in rows:
                if r.user_id not in final or r.n > final[r.user_id][0]:
                    final[r.user_id] = (r.n, round(r.total, 6), r.vmax)
            results[name] = final
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)

    assert results["v2"] == results["v1"]
    assert len(results["v2"]) > 0


def test_audio_windows(spark):
    """Sliding PCM windows: deterministic per content, correct window
    count/geometry, RMS/peak match a local numpy replay."""
    import numpy as np

    from dislib_spark.multimodal.binary import audio_windows, fake_pcm_decode

    rows = [(i, bytes([i] * 16)) for i in range(4)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = audio_windows(media, window=1024, hop=512, n_samples=4096).collect()
    # (4096 - 1024) / 512 + 1 = 7 windows per media row
    assert len(got) == 4 * 7
    by_key = {(r.media_id, r.win_idx): r for r in got}
    for mid, content in rows:
        pcm = fake_pcm_decode(content, 4096)
        for i, start in enumerate(range(0, 4096 - 1024 + 1, 512)):
            seg = pcm[start : start + 1024]
            r = by_key[(mid, i)]
            assert r.win_start == start
            assert abs(r.rms - float(np.sqrt(np.mean(seg**2)))) < 1e-9
            assert abs(r.peak - float(np.abs(seg).max())) < 1e-9


def test_stream_static_enrich_parity(spark, tmp_path):
    """Stream-static join: the streaming (availableNow, complete
    mode) result must equal the batch form on the same data."""
    from dislib_spark.streaming.windows import stream_static_enrich
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_SMOKE, "events")
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    batch = {
        tuple(r)
        for r in stream_static_enrich(ev, dim, on="user_id").collect()
    }
    src_dir = str(tmp_path / "enrich_src")
    ev.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = (
        stream_static_enrich(stream, dim, on="user_id")
        .writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_enrich").collect()}
    assert got == batch


def test_json_orc_roundtrip(spark, tmp_path):
    import numpy as np
    from dislib_spark.array import array as ds_array
    from dislib_spark.sources.io import (
        load_json,
        load_orc,
        save_json,
        save_orc,
    )

    x = np.arange(24.0).reshape(6, 4)
    a = ds_array(x, spark=spark)
    pj, po = str(tmp_path / "j"), str(tmp_path / "o")
    save_json(a, pj)
    save_orc(a, po)
    assert np.array_equal(load_json(spark, pj).collect(), x)
    assert np.array_equal(load_orc(spark, po).collect(), x)


def test_incremental_rollup_stream_equals_batch(spark, tmp_path):
    """Streaming continuous-aggregate maintenance: drain the events
    table through incremental_rollup_sink in MULTIPLE micro-batches
    (maxFilesPerTrigger=1 over a 3-file source), then read_rollup's
    merged partials must equal the one-shot batch rollup exactly
    (counts and decimal sums are associative — the merge-on-read
    contract)."""
    from dislib_spark.streaming.windows import (
        incremental_rollup_sink,
        read_rollup,
        rollup_partials,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_src")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = str(tmp_path / "rollup")
    q = incremental_rollup_sink(
        stream, sink, str(tmp_path / "ckpt"), availableNow=True
    )
    await_drain(q, 180)
    assert q.lastProgress is not None
    # > 1 partial row per (bucket, type) proves multi-batch appends
    n_partials = spark.read.parquet(sink).count()

    got = {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_value"])
        for r in read_rollup(spark, sink).collect()
    }
    from pyspark.sql import functions as F

    want = {
        (r["bucket"], r["event_type"]): (
            r["n"],
            float(r["sv"]),
        )
        for r in rollup_partials(ev)
        .select(
            "bucket",
            "event_type",
            F.col("n").cast("long").alias("n"),
            "sv",
        )
        .collect()
    }
    assert got == want
    assert n_partials > len(want)


def _pgm_bytes(h, w, seed, ascii_form=False):
    import numpy as np

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    if ascii_form:
        body = "\n".join(" ".join(str(v) for v in row) for row in img)
        return f"P2\n# comment\n{w} {h}\n255\n{body}\n".encode(), img
    return b"P5\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def _wav_bytes(n, seed, width=2):
    import io
    import wave

    import numpy as np

    rng = np.random.RandomState(seed)
    pcm = (rng.rand(n) * 2 - 1).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(16000)
        wf.writeframes((pcm * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_multimodal_decode_real_pgm_codec(spark):
    """The SAME decode->pool pipeline as test_multimodal_decode, but
    through the real stdlib PGM codec on genuine image bytes — the
    real-codec swap-in is pipeline-identical to the fake (only the
    codec callable changes)."""
    import numpy as np

    from dislib_spark.multimodal.binary import decode_image, pgm_decode

    rows, imgs = [], {}
    for i in range(4):
        payload, img = _pgm_bytes(8, 8, seed=i, ascii_form=(i % 2 == 1))
        rows.append((i, payload))
        imgs[i] = img
    media = spark.createDataFrame(rows, "media_id long, content binary")
    feats = decode_features(media, codec=decode_image, out_side=4)
    got = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(got) == 4
    for mid, img in imgs.items():
        pooled = (
            img.astype(np.float64).reshape(4, 2, 4, 2).mean(axis=(1, 3))
        )
        assert np.allclose(got[mid], pooled.ravel())
    # local codec agrees on both P5 and P2 forms of the same raster
    p5, raw = _pgm_bytes(5, 7, seed=42)
    p2, _ = _pgm_bytes(5, 7, seed=42, ascii_form=True)
    assert np.array_equal(pgm_decode(p5), pgm_decode(p2))
    assert np.array_equal(pgm_decode(p5), raw.astype(float))


def test_audio_windows_real_wav_codec(spark):
    """audio_windows through the real stdlib WAV codec: window
    geometry and RMS/peak match a local numpy replay of the same
    bytes (same assertions as the fake-codec test)."""
    import numpy as np

    from dislib_spark.multimodal.binary import audio_windows, wav_pcm_decode

    rows = [(i, _wav_bytes(4096, seed=i)) for i in range(3)]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = audio_windows(
        media, window=1024, hop=512, codec=wav_pcm_decode
    ).collect()
    assert len(got) == 3 * 7
    by_key = {(r.media_id, r.win_idx): r for r in got}
    for mid, content in rows:
        pcm = wav_pcm_decode(content)
        assert pcm.shape == (4096,) and pcm.dtype == np.float32
        for i, start in enumerate(range(0, 4096 - 1024 + 1, 512)):
            seg = pcm[start : start + 1024]
            r = by_key[(mid, i)]
            assert abs(r.rms - float(np.sqrt(np.mean(seg**2)))) < 1e-6
            assert abs(r.peak - float(np.abs(seg).max())) < 1e-6


def test_multimodal_decode_pil_codec(spark):
    """Same pipeline through Pillow when installed; skipped (with the
    gate asserted) otherwise."""
    from dislib_spark.multimodal.binary import pil_decode

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="Pillow"):
            pil_decode(b"\x89PNG\r\n")
        pytest.skip("Pillow not installed")
    payload, img = _pgm_bytes(8, 8, seed=9)  # PIL reads PGM too
    media = spark.createDataFrame(
        [(0, payload)], "media_id long, content binary"
    )
    got = decode_features(media, codec=pil_decode, out_side=4).collect()
    assert len(got) == 1 and len(got[0]["features"]) == 16


def test_audio_windows_soundfile_codec(spark):
    """Same pipeline through soundfile when installed; skipped (with
    the gate asserted) otherwise."""
    from dislib_spark.multimodal.binary import (
        audio_windows,
        soundfile_pcm_decode,
        wav_pcm_decode,
    )

    try:
        import soundfile  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="soundfile"):
            soundfile_pcm_decode(_wav_bytes(64, seed=1))
        pytest.skip("soundfile not installed")
    import numpy as np

    wav = _wav_bytes(2048, seed=3)
    assert np.allclose(
        soundfile_pcm_decode(wav), wav_pcm_decode(wav), atol=1e-4
    )
    media = spark.createDataFrame([(0, wav)], "media_id long, content binary")
    got = audio_windows(
        media, window=512, hop=256, codec=soundfile_pcm_decode
    ).collect()
    assert len(got) == (2048 - 512) // 256 + 1


def test_stream_stream_join_parity(spark, tmp_path):
    """Stream-stream interval join: the streaming (availableNow,
    append mode — inner joins emit finalized matches) result equals
    the batch form of the SAME function on the same data, and the
    streaming plan carries watermarks on both sides."""
    from pyspark.sql import functions as F

    from dislib_spark.streaming.windows import stream_stream_join

    ev = load_table(spark, SF_SMOKE, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    batch = {
        tuple(r)
        for r in stream_stream_join(clicks, purchases).collect()
    }
    src = str(tmp_path / "ssj_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    joined = stream_stream_join(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 120)
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM t_ssj").collect()
    }
    # streaming timestamps come back LTZ; normalize via the lag and
    # key columns which are timezone-free
    batch_k = {(r[0], r[3]) for r in batch}
    got_k = {(r[0], r[3]) for r in got}
    assert got_k == batch_k
    assert len(got) == len(batch)


def test_stream_stream_left_join_parity(spark, tmp_path):
    """LEFT OUTER stream-stream join: matched pairs equal the batch
    join's, and every unmatched click emits exactly once with nulls
    AFTER the watermark passes its window (state TTL). A finite
    stream never expires its newest state, so two far-future sentinel
    batches advance the global watermark past all real clicks — after
    the flush, streaming output ≡ the batch left join exactly."""
    import datetime

    from pyspark.sql import functions as F

    from dislib_spark.streaming.windows import stream_stream_left_join

    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    batch = {
        tuple(r)
        for r in stream_stream_left_join(c, p).collect()
    }
    assert any(r[3] is None for r in batch)  # real unmatched clicks

    cd, pd_ = str(tmp_path / "c"), str(tmp_path / "p")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    c.write.mode("overwrite").parquet(cd)
    p.write.mode("overwrite").parquet(pd_)
    max_ts = ev.agg(F.max("ts")).first()[0]

    def run_once():
        cs = spark.readStream.schema(c.schema).parquet(cd)
        ps = spark.readStream.schema(p.schema).parquet(pd_)
        j = stream_stream_left_join(cs, ps)
        q = (
            j.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_drain(q, 180)
    run_once()
    # sentinel rounds: each advances both sides' watermarks; round 2
    # runs with round 1's watermark already past every real click, so
    # the expired unmatched state flushes
    for hours in (10, 20):
        st = max_ts + datetime.timedelta(hours=hours)
        sent = spark.createDataFrame([(-1, -1, st)], c.schema)
        sent.write.mode("append").parquet(cd)
        sent.write.mode("append").parquet(pd_)
        run_once()

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .where(F.col("user_id") >= 0)
        .collect()
    }
    assert got == batch


def test_stream_dedup_archive_equals_batch(spark, tmp_path):
    """s13 as a REAL stream: drain the odd-id docs through an
    availableNow parquet stream in MULTIPLE micro-batches
    (maxFilesPerTrigger=1 over a 3-file source); each micro-batch
    probes the SAME stored md5-mode LSH index via foreachBatch, and
    the union of per-batch matches must equal the one-shot batch
    probe exactly (band hashes are content-determined — no
    cross-batch state, so streaming ≡ batch by construction)."""
    from pyspark.sql import functions as F

    from dislib_spark.text.dedup import (
        dedup_against_index,
        minhash_index,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    ix = minhash_index(d.where(F.col("doc_id") % 2 == 0), hash_fn="md5")
    ix_path = str(tmp_path / "lsh_index")
    ix.write.partitionBy("band_idx").parquet(ix_path)
    stored = spark.read.parquet(ix_path)

    batch = d.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    want = sorted(
        (r["new_id"], r["index_id"], r["jaccard"])
        for r in dedup_against_index(
            batch, stored, threshold=0.3, hash_fn="md5"
        ).collect()
    )

    src = str(tmp_path / "new_docs")
    batch.repartition(3).write.parquet(src)
    out_path = str(tmp_path / "matches")
    n_batches = []

    def probe(bdf, epoch_id):
        n_batches.append(epoch_id)
        dedup_against_index(
            bdf, stored, threshold=0.3, hash_fn="md5"
        ).write.mode("append").parquet(out_path)

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(probe)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 180)
    assert len(n_batches) >= 3  # genuinely multi-micro-batch
    got = sorted(
        (r["new_id"], r["index_id"], r["jaccard"])
        for r in spark.read.parquet(out_path).collect()
    )
    assert got == want and len(want) > 0


def test_dedup_then_window_chained_stateful_parity(spark, tmp_path):
    """s14 as a REAL stream: doubled events drain through an
    availableNow parquet stream into dropDuplicatesWithinWatermark
    CHAINED with a tumbling count (two stateful operators, one
    query). Append mode only emits windows the watermark has closed,
    so a far-future sentinel round flushes the tail; after the flush
    the emitted windows (sentinel's own window excluded) must equal
    the batch form exactly."""
    import datetime

    from pyspark.sql import functions as F

    from dislib_spark.streaming.windows import dedup_then_tumbling_counts

    ev = load_table(spark, SF_SMOKE, "events")
    doubled = ev.unionAll(ev)
    batch = {
        (r.w_start, r.w_end, r.event_type, r.n)
        for r in dedup_then_tumbling_counts(doubled).collect()
    }

    src_dir = str(tmp_path / "s14_src")
    out = str(tmp_path / "s14_out")
    ckpt = str(tmp_path / "s14_ckpt")
    doubled.write.mode("overwrite").parquet(src_dir)
    max_ts = ev.agg(F.max("ts")).first()[0]

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src_dir)
        q = (
            dedup_then_tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_drain(q, 180)
    run_once()
    for hours in (10, 20):
        st = max_ts + datetime.timedelta(hours=hours)
        sent = spark.createDataFrame(
            [(-1, st, -1, "sentinel", 0.0, "{}")], ev.schema
        )
        sent.write.mode("append").parquet(src_dir)
        run_once()

    got = {
        (r.w_start, r.w_end, r.event_type, r.n)
        for r in spark.read.parquet(out)
        .where(F.col("event_type") != "sentinel")
        .collect()
    }
    assert got == batch


def test_stream_sessions_timer_parity(spark, tmp_path):
    """s15 as a REAL stream: events drain through an availableNow
    parquet stream into the transformWithState SESSION processor
    (event-time TIMERS close idle sessions when the watermark
    passes start+gap) in TWO event-time-ordered rounds sharing one
    checkpoint — sessions straddling the round boundary must
    continue, not split — then two far-future sentinel rounds
    advance the watermark past every real event so the open tails
    flush via timers. The flushed session set must equal the batch
    gaps-and-islands replay exactly."""
    import datetime

    from pyspark.sql import functions as F

    from dislib_spark.streaming.stateful import (
        ensure_protobuf,
        stream_sessions,
    )

    if not ensure_protobuf(spark):
        pytest.skip("no protobuf runtime (wheel or vendored)")

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .where(F.col("user_id") < 30)
        .select("user_id", "ts")
    )
    batch = {
        tuple(r) for r in stream_sessions(ev, gap="15 minutes").collect()
    }
    assert len(batch) > 0

    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    mid, max_ts = ev.agg(
        F.date_trunc("second", F.min("ts"))
        + F.expr("INTERVAL 12 HOURS"),
        F.max("ts"),
    ).first()
    # round 1: the early half, in event-time order; round 2: the rest
    ev.where(F.col("ts") <= mid).write.parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            stream_sessions(stream, gap="15 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_drain(q, 180)
    try:
        run_once()
        ev.where(F.col("ts") > mid).write.mode("append").parquet(src)
        run_once()
        for hours in (10, 20):
            st = max_ts + datetime.timedelta(hours=hours)
            spark.createDataFrame(
                [(-1, st)], ev.schema
            ).write.mode("append").parquet(src)
            run_once()
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .where(F.col("user_id") >= 0)
        .collect()
    }
    assert got == batch


def test_stream_sessions_disordered_feed_parity(spark, tmp_path):
    """The ADVICE scenario: a LATE round (earlier event times, still
    inside the watermark) arrives after a round that already showed a
    gap between two clusters of events — the late row BRIDGES them
    into one session. Eager emit-on-gap would have split it; the
    buffered, timer-only processor must produce exactly the batch
    gaps-and-islands result regardless of arrival order."""
    import datetime

    from pyspark.sql import functions as F

    from dislib_spark.streaming.stateful import (
        ensure_protobuf,
        stream_sessions,
    )

    if not ensure_protobuf(spark):
        pytest.skip("no protobuf runtime (wheel or vendored)")

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def at(s):
        return base + datetime.timedelta(seconds=s)

    # gap = 15 min = 900 s. user 1: 0 and 1600 look like two sessions
    # until the late 800 bridges them; user 2: 0 and 5000 stay two
    # sessions (the late 3000 is > gap from both sides... 3000-0 >
    # 900 and 5000-3000 > 900, so it forms its OWN middle session);
    # user 3: in-order control.
    round1 = [(1, at(0)), (1, at(1600)), (2, at(0)), (2, at(5000)),
              (3, at(100)), (3, at(200))]
    late = [(1, at(800)), (2, at(3000))]

    schema = "user_id long, ts timestamp"
    ev = spark.createDataFrame(round1 + late, schema)
    batch = {
        tuple(r) for r in stream_sessions(ev, gap="15 minutes").collect()
    }
    # sanity: the bridge merged user 1 into ONE session of 3 events
    u1 = {t for t in batch if t[0] == 1}
    assert u1 == {(1, int(at(0).timestamp()), int(at(1600).timestamp()), 3)}
    u2 = {t for t in batch if t[0] == 2}
    assert len(u2) == 3

    src = str(tmp_path / "dis_src")
    out = str(tmp_path / "dis_out")
    ckpt = str(tmp_path / "dis_ckpt")
    spark.createDataFrame(round1, schema).write.parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_sessions(stream, gap="15 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_drain(q, 180)
    try:
        run_once()
        # the LATE round: event times BEFORE what round 1 already saw
        # (within the 2h watermark — max seen is at(5000), wm lags 2h)
        spark.createDataFrame(late, schema).write.mode(
            "append"
        ).parquet(src)
        run_once()
        for hours in (10, 20):
            st = at(5000) + datetime.timedelta(hours=hours)
            spark.createDataFrame(
                [(-1, st)], schema
            ).write.mode("append").parquet(src)
            run_once()
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)

    got = {
        tuple(r)
        for r in spark.read.parquet(out)
        .where(F.col("user_id") >= 0)
        .collect()
    }
    assert got == batch
