"""Multimodal Arrow-plumbing scale smoke: 200k ~1 KB binary blobs
through the real mapInPandas decode / frame-sample / audio-window
paths (deterministic fake codecs — the container has no PIL/ffmpeg;
the measured cost is exactly the part that survives a real codec
swap: Arrow batch transfer + python loop + 1→N fan-out + the
embedding-side aggregation).

Methodology matches the text smoke: blobs are written to parquet and
operators measured off the scan. Run:
    PYTHONPATH=/root/repo python tools/multimodal_smoke.py
"""

from __future__ import annotations

import sys
import time

N = 200_000
_SMOKE_DIR = "/tmp/mm_smoke"


def timed(label, fn):
    t = time.time()
    out = fn()
    print(f"{label:44s} {time.time() - t:6.2f} s")
    return out


def main():
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from dislib_spark.multimodal import (
        audio_windows,
        decode_features,
        frame_sample,
    )
    from dislib_spark.session import get_spark

    spark = get_spark(app_name="multimodal-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def gen_blobs():
        # ~1 KB pseudo-random binary per row, generated JVM-side
        # (unbase64 of repeated md5 hex — no driver data, no python)
        chunk = F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), F.lit(44)),
                lambda i: F.md5(F.concat(F.col("id").cast("string"), i.cast("string"))),
            ),
        )
        (
            spark.range(0, N, 1, par)
            .select(
                F.col("id").alias("media_id"),
                F.encode(chunk, "utf-8").alias("content"),
            )
            .write.mode("overwrite")
            .parquet(_SMOKE_DIR + "/blobs.parquet")
        )
        return spark.read.parquet(_SMOKE_DIR + "/blobs.parquet")

    media = timed(f"generate {N} ~1.4KB blobs (JVM expr)", gen_blobs)

    timed(
        "decode → 4×4 pooled features (mapInPandas)",
        lambda: decode_features(media)
        .agg(F.count(F.lit(1)), F.avg(F.element_at("features", 1)))
        .collect(),
    )
    timed(
        "frame sample 1→4 (UDTF shape)",
        lambda: frame_sample(media, n_frames=4)
        .agg(F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "audio sliding RMS/peak windows",
        lambda: audio_windows(media)
        .agg(F.count(F.lit(1)), F.avg("rms"))
        .collect(),
    )


if __name__ == "__main__":
    main()
