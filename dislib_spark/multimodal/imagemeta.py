"""Real (codec-free) image metadata extraction from binary columns.

Unlike the decode/resize path (honestly stubbed — no PIL/ffmpeg in
this environment), container HEADERS are plain byte layouts, so
width/height/format extraction is implementable for real with
``struct``: PNG IHDR, GIF logical screen descriptor, BMP DIB header,
and JPEG SOF0/SOF2 frame markers. This is the metadata-profiling pass
a multimodal pipeline runs BEFORE any expensive decode (drop tiny
thumbnails, bucket by aspect ratio, route by format) — and it only
needs the first few KB of each blob.

Scale: Arrow-batched ``mapInPandas`` over the binary column; pure
python byte peeking per row, no image library, no shuffle. With a
``binaryFile`` source you'd project only `path` + `content` and could
read headers without fetching full blobs when the store supports
range reads.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def parse_image_header(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from container magic bytes, or None
    if the payload is not a recognized image."""
    if data is None or len(data) < 16:
        return None
    # PNG: 8-byte signature, then IHDR length+type, then w/h big-endian
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        if data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            return ("png", w, h)
        return None
    # GIF87a / GIF89a: logical screen w/h little-endian at offset 6
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h)
    # BMP: 'BM', DIB header at 14; BITMAPINFOHEADER has i32 w/h,
    # legacy BITMAPCOREHEADER (size 12) has u16
    if data[:2] == b"BM" and len(data) >= 26:
        dib = struct.unpack("<I", data[14:18])[0]
        if dib == 12:
            w, h = struct.unpack("<HH", data[18:22])
            return ("bmp", w, h)
        w, h = struct.unpack("<ii", data[18:26])
        return ("bmp", w, abs(h))
    # JPEG: scan markers for SOF0/SOF2 (baseline/progressive frame)
    if data[:2] == b"\xff\xd8":
        i = 2
        n = len(data)
        while i + 9 < n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None


def image_meta(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("path",),
) -> DataFrame:
    """Append (format, width, height, n_bytes) parsed from the binary
    column's container header; unrecognized payloads get NULL format.
    Arrow-batched narrow map — no shuffle, no codec dependency."""
    schema = (
        ", ".join(f"{c} string" for c in id_cols)
        + ", format string, width int, height int, n_bytes long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c].astype(str) for c in id_cols}
            fmts, ws, hs, nb = [], [], [], []
            for data in pdf[content_col]:
                raw = bytes(data) if data is not None else b""
                meta = parse_image_header(raw)
                nb.append(len(raw))
                if meta is None:
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                else:
                    fmts.append(meta[0])
                    ws.append(meta[1])
                    hs.append(meta[2])
            out["format"] = pd.Series(fmts, dtype="object")
            out["width"] = pd.Series(ws, dtype="Int32")
            out["height"] = pd.Series(hs, dtype="Int32")
            out["n_bytes"] = pd.Series(nb, dtype="int64")
            yield pd.DataFrame(out)

    return df.select(*id_cols, content_col).mapInPandas(run, schema=schema)


def parse_wav_header(data: bytes) -> tuple[int, int, int, float] | None:
    """(sample_rate, channels, bits_per_sample, duration_s) from a
    RIFF/WAVE header — same codec-free profiling idea for audio (route
    by sample rate, drop sub-second clips, estimate decode cost)."""
    if data is None or len(data) < 44:
        return None
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i, n = 12, len(data)
    rate = ch = bits = None
    data_len = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        clen = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            ch, rate = struct.unpack("<HI", data[i + 10 : i + 16])
            bits = struct.unpack("<H", data[i + 22 : i + 24])[0]
        elif cid == b"data":
            data_len = clen
        i += 8 + clen + (clen & 1)
    if rate is None or data_len is None or rate == 0 or ch == 0 or bits == 0:
        return None
    dur = data_len / (rate * ch * (bits // 8))
    return (rate, ch, bits, dur)


def audio_meta(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("path",),
) -> DataFrame:
    """Append (sample_rate, channels, bits, duration_s) parsed from
    WAV headers; non-WAV payloads get NULLs. Arrow-batched narrow
    map, same contract as ``image_meta``."""
    schema = (
        ", ".join(f"{c} string" for c in id_cols)
        + ", sample_rate int, channels int, bits int, duration_s double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c].astype(str) for c in id_cols}
            rs, cs, bs, ds = [], [], [], []
            for data in pdf[content_col]:
                meta = parse_wav_header(
                    bytes(data) if data is not None else b""
                )
                if meta is None:
                    rs.append(None); cs.append(None)
                    bs.append(None); ds.append(None)
                else:
                    rs.append(meta[0]); cs.append(meta[1])
                    bs.append(meta[2]); ds.append(meta[3])
            out["sample_rate"] = pd.Series(rs, dtype="Int32")
            out["channels"] = pd.Series(cs, dtype="Int32")
            out["bits"] = pd.Series(bs, dtype="Int32")
            out["duration_s"] = pd.Series(ds, dtype="float64")
            yield pd.DataFrame(out)

    return df.select(*id_cols, content_col).mapInPandas(run, schema=schema)


def parse_mp4_header(data: bytes):
    """(brand, duration_s, width, height) from ISO-BMFF (MP4/MOV) box
    structure — ``ftyp`` major brand, ``moov/mvhd`` timescale+duration,
    first ``moov/trak/tkhd`` 16.16 fixed-point dimensions. Same
    codec-free profiling idea as PNG/WAV: route by container, drop
    sub-second clips, estimate decode cost — no ffmpeg needed, and
    only the (typically front-loaded) moov box is touched."""
    if data is None or len(data) < 16:
        return None

    def boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i : i + 4])[0]
            btype = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1 and i + 16 <= end:
                size = struct.unpack(">Q", buf[i + 8 : i + 16])[0]
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr:
                return
            yield btype, i + hdr, min(i + size, end)
            i += size

    brand = None
    dur = width = height = None
    for btype, s, e in boxes(data, 0, len(data)):
        if btype == b"ftyp" and e - s >= 4:
            brand = data[s : s + 4].decode("ascii", "replace").strip()
        elif btype == b"moov":
            for b2, s2, e2 in boxes(data, s, e):
                if b2 == b"mvhd" and e2 - s2 >= 20:
                    ver = data[s2]
                    if ver == 1 and e2 - s2 >= 28:
                        ts = struct.unpack(">I", data[s2 + 20 : s2 + 24])[0]
                        d = struct.unpack(">Q", data[s2 + 24 : s2 + 32])[0]
                    else:
                        ts, d = struct.unpack(
                            ">II", data[s2 + 12 : s2 + 20]
                        )
                    if ts:
                        dur = d / ts
                elif b2 == b"trak" and width is None:
                    for b3, s3, e3 in boxes(data, s2, e2):
                        if b3 == b"tkhd" and e3 - s3 >= 84:
                            w, h = struct.unpack(
                                ">II", data[e3 - 8 : e3]
                            )
                            if w and h:
                                width = w / 65536.0
                                height = h / 65536.0
    if brand is None and dur is None:
        return None
    return (brand, dur, width, height)


def video_meta(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("path",),
) -> DataFrame:
    """Append (brand, duration_s, width, height) parsed from ISO-BMFF
    container boxes; non-MP4 payloads get NULLs. Arrow-batched narrow
    map, same contract as ``image_meta``/``audio_meta``."""
    schema = (
        ", ".join(f"{c} string" for c in id_cols)
        + ", brand string, duration_s double, width double, height double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c].astype(str) for c in id_cols}
            brs, ds, ws, hs = [], [], [], []
            for data in pdf[content_col]:
                meta = parse_mp4_header(
                    bytes(data) if data is not None else b""
                )
                if meta is None:
                    brs.append(None); ds.append(None)
                    ws.append(None); hs.append(None)
                else:
                    brs.append(meta[0]); ds.append(meta[1])
                    ws.append(meta[2]); hs.append(meta[3])
            out["brand"] = pd.Series(brs, dtype="object")
            out["duration_s"] = pd.Series(ds, dtype="float64")
            out["width"] = pd.Series(ws, dtype="float64")
            out["height"] = pd.Series(hs, dtype="float64")
            yield pd.DataFrame(out)

    return df.select(*id_cols, content_col).mapInPandas(run, schema=schema)
