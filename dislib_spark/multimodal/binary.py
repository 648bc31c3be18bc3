"""Multimodal (image/audio/video) column plumbing.

Not in the reference (dislib is numeric-matrix only); part of the
engine's training-data-pipeline surface. Design: media are opaque
``BINARY`` columns with typed metadata columns; decode/feature
steps are Arrow-batched ``mapInPandas`` UDFs so each executor
processes whole batches without driver involvement.

The actual codec calls are STUBBED (image/audio libs are not in
this container — ``decode_image`` raises unless given the
deterministic fake codec); the Spark-side plumbing (schema,
partitioning, batch shapes, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def load_binary_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Directory of media files → media table (binaryFile source:
    distributed scan, content never touches the driver)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def fake_decode(content: bytes, width: int = 8, height: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: expands the
    md5 of the payload into a (h, w) grayscale grid. Lets the full
    pipeline (decode → resize → embed) run and be asserted on
    without PIL/ffmpeg."""
    digest = hashlib.md5(content or b"").digest()
    rng = np.random.RandomState(
        int.from_bytes(digest[:4], "little", signed=False)
    )
    return rng.randint(0, 256, size=(height, width)).astype(np.float64)


def decode_image(content: bytes) -> np.ndarray:  # pragma: no cover
    """Real decoder stub — wire PIL/opencv here when available."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "use codec=fake_decode for the deterministic fake"
    )


def decode_features(
    media: DataFrame,
    codec=fake_decode,
    out_side: int = 4,
) -> DataFrame:
    """Decode + average-pool-resize + flatten to a feature vector.
    Arrow-batched mapInPandas: one python invocation per batch, rows
    stay on executors. Returns (media_id, features array<double>)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                img = codec(bytes(content) if content is not None else b"")
                h, w = img.shape
                bh, bw = max(h // out_side, 1), max(w // out_side, 1)
                pooled = (
                    img[: bh * out_side, : bw * out_side]
                    .reshape(out_side, bh, out_side, bw)
                    .mean(axis=(1, 3))
                )
                feats.append(pooled.ravel().tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.select("media_id", "content").mapInPandas(
        run, "media_id long, features array<double>"
    )


def frame_sample(
    media: DataFrame, n_frames: int = 4, codec=fake_decode
) -> DataFrame:
    """Video frame sampling (stubbed): emits n_frames decoded frames
    per media row (1→N via mapInPandas, the UDTF shape). Returns
    (media_id, frame_idx, features)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                for fi in range(n_frames):
                    img = codec(payload + fi.to_bytes(2, "little"))
                    ids.append(mid)
                    idxs.append(fi)
                    feats.append(img.ravel().tolist())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "features": feats}
            )

    return media.select("media_id", "content").mapInPandas(
        run, "media_id long, frame_idx int, features array<double>"
    )


def fake_pcm_decode(content: bytes, n_samples: int = 4096) -> np.ndarray:
    """Deterministic stand-in for an audio decoder: expands the md5 of
    the payload into ``n_samples`` float32 PCM samples in [-1, 1]."""
    digest = hashlib.md5(content or b"").digest()
    rng = np.random.RandomState(
        int.from_bytes(digest[4:8], "little", signed=False)
    )
    return (rng.rand(n_samples).astype("float32") * 2.0) - 1.0


def audio_windows(
    media: DataFrame,
    window: int = 1024,
    hop: int = 512,
    codec=None,
    n_samples: int = 4096,
) -> DataFrame:
    """Sliding sample windows over decoded audio: one output row per
    (media_id, window) with RMS energy and peak amplitude — the
    standard first stage of any audio feature pipeline (VAD, silence
    trimming, loudness filters).

    Arrow-batched ``mapInPandas`` 1→N like ``frame_sample``: each
    executor decodes its batch and emits window rows locally, nothing
    on the driver. ``codec`` defaults to the honest fake
    (``fake_pcm_decode``); swap in a real soundfile/ffmpeg decode
    with the same ``bytes -> float32[n]`` contract when available."""
    import pandas as pd

    decode = codec or (lambda b: fake_pcm_decode(b, n_samples))
    out_schema = (
        "media_id long, win_idx int, win_start long, rms double, peak double"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                pcm = decode(bytes(content) if content is not None else b"")
                for i, start in enumerate(
                    range(0, max(len(pcm) - window + 1, 1), hop)
                ):
                    seg = pcm[start : start + window]
                    rows.append(
                        (
                            int(mid),
                            i,
                            start,
                            float(np.sqrt(np.mean(seg**2))),
                            float(np.abs(seg).max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "win_idx", "win_start", "rms", "peak"],
            )

    return media.select("media_id", "content").mapInPandas(run, out_schema)
