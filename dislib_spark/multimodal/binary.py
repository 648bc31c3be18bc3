"""Multimodal (image/audio/video) column plumbing.

Not in the reference (dislib is numeric-matrix only); part of the
engine's training-data-pipeline surface. Design: media are opaque
``BINARY`` columns with typed metadata columns; decode/feature
steps are Arrow-batched ``mapInPandas`` UDFs so each executor
processes whole batches without driver involvement.

Codec tiers, all sharing one ``bytes -> ndarray`` contract so they
drop into the same pipelines interchangeably:

- deterministic fakes (``fake_decode`` / ``fake_pcm_decode``) —
  hermetic pipeline tests with zero deps;
- stdlib real codecs (``pgm_decode`` for netpbm images,
  ``wav_pcm_decode`` for RIFF/WAV audio) — genuine bytes-in
  formats exercised even in minimal containers;
- optional-dependency adapters (``pil_decode`` /
  ``soundfile_pcm_decode``) gated behind import-try with a clear
  ImportError — the full-format path when Pillow/soundfile are
  installed (their tests skip, not fail, without them).

The Spark-side plumbing (schema, partitioning, Arrow batch shapes,
UDF signatures) is identical across tiers and fully tested.
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


def pil_decode(content: bytes) -> np.ndarray:
    """Real image decoder via Pillow (optional dependency): any
    PIL-supported format → grayscale float64 (h, w). Same
    ``bytes -> ndarray`` contract as ``fake_decode``, so it drops
    into ``decode_features``/``frame_sample`` unchanged. Raises
    ImportError when Pillow is absent (tests skip, fake path
    unaffected)."""
    import io

    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "pil_decode needs Pillow (pip install pillow); "
            "use codec=fake_decode or pgm_decode without it"
        ) from e
    img = Image.open(io.BytesIO(content)).convert("L")
    return np.asarray(img, dtype=np.float64)


def pgm_decode(content: bytes) -> np.ndarray:
    """Real image decoder, stdlib-only: netpbm PGM (P5 binary / P2
    ascii, 8-bit) → float64 (h, w). A genuine on-disk format, so the
    decode→pool→embed pipeline is exercised against real image bytes
    even in environments without Pillow."""
    if not content.startswith((b"P5", b"P2")):
        raise ValueError("not a PGM payload (want P5/P2 magic)")
    # header = magic, width, height, maxval — whitespace/comment
    # separated, then raster
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(content[i:j])
        i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PGM unsupported")
    if content.startswith(b"P5"):
        raster = content[i + 1 : i + 1 + w * h]
        arr = np.frombuffer(raster, dtype=np.uint8, count=w * h)
    else:
        arr = np.array(content[i:].split()[: w * h], dtype=np.uint8)
    return arr.reshape(h, w).astype(np.float64)


def decode_image(content: bytes) -> np.ndarray:
    """Auto-dispatching real decoder: PGM handled in-process
    (stdlib), anything else through Pillow when installed."""
    if content.startswith((b"P5", b"P2")):
        return pgm_decode(content)
    return pil_decode(content)


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


def wav_pcm_decode(content: bytes) -> np.ndarray:
    """Real audio decoder, stdlib-only: RIFF/WAV INTEGER PCM
    (8/16/32-bit) → mono float32 in [-1, 1]. IEEE-float WAV is NOT
    supported: stdlib ``wave`` rejects WAVE_FORMAT_IEEE_FLOAT
    (wave.Error), and the width-4 branch below decodes int32 — use
    ``soundfile_pcm_decode`` for float streams. Same contract as
    ``fake_pcm_decode``, so ``audio_windows`` runs against real audio
    bytes without soundfile/ffmpeg."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # unsigned 8-bit
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        ints = np.frombuffer(raw, dtype="<i4")
        pcm = ints.astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    return pcm.astype(np.float32)


def soundfile_pcm_decode(content: bytes) -> np.ndarray:
    """Real audio decoder via soundfile (optional dependency): any
    libsndfile format → mono float32. Raises ImportError when absent
    (tests skip; ``wav_pcm_decode`` covers WAV without it)."""
    import io

    try:
        import soundfile as sf
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "soundfile_pcm_decode needs soundfile (pip install "
            "soundfile); use wav_pcm_decode or fake_pcm_decode"
        ) from e
    data, _sr = sf.read(io.BytesIO(content), dtype="float32")
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data.astype(np.float32)


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
