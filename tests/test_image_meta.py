"""Codec-free image header parsing: REAL minimal PNG/GIF/BMP/JPEG
payloads constructed byte-for-byte, parsed through the Arrow
mapInPandas path."""

from __future__ import annotations

import struct
import zlib

from dislib_spark.multimodal.imagemeta import image_meta, parse_image_header


def _png(w: int, h: int) -> bytes:
    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # one grayscale scanline per row: filter byte + w zero pixels
    raw = b"".join(b"\x00" + b"\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6 + b"\x3b"


def _bmp(w: int, h: int) -> bytes:
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    return header + dib + b"\x00" * 16


def _jpeg(w: int, h: int) -> bytes:
    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return soi + app0 + sof0 + b"\xff\xd9"


def test_parse_image_header_formats():
    assert parse_image_header(_png(320, 240)) == ("png", 320, 240)
    assert parse_image_header(_gif(17, 5)) == ("gif", 17, 5)
    assert parse_image_header(_bmp(64, 48)) == ("bmp", 64, 48)
    assert parse_image_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    # top-down BMP stores negative height
    neg = bytearray(_bmp(10, 7))
    neg[22:26] = struct.pack("<i", -7)
    assert parse_image_header(bytes(neg)) == ("bmp", 10, 7)
    assert parse_image_header(b"not an image at all....") is None
    assert parse_image_header(b"") is None


def test_image_meta_mapinpandas(spark):
    rows = [
        ("a.png", bytearray(_png(320, 240))),
        ("b.gif", bytearray(_gif(17, 5))),
        ("c.bmp", bytearray(_bmp(64, 48))),
        ("d.jpg", bytearray(_jpeg(1920, 1080))),
        ("e.txt", bytearray(b"plain text, definitely not an image")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["path"]: r for r in image_meta(df).collect()}
    assert (got["a.png"]["format"], got["a.png"]["width"], got["a.png"]["height"]) == ("png", 320, 240)
    assert (got["b.gif"]["width"], got["b.gif"]["height"]) == (17, 5)
    assert (got["c.bmp"]["width"], got["c.bmp"]["height"]) == (64, 48)
    assert (got["d.jpg"]["format"], got["d.jpg"]["width"], got["d.jpg"]["height"]) == ("jpeg", 1920, 1080)
    assert got["e.txt"]["format"] is None
    assert got["a.png"]["n_bytes"] == len(_png(320, 240))


def _wav(rate=16000, ch=1, bits=16, n_frames=16000) -> bytes:
    data_len = n_frames * ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_parse_wav_header():
    from dislib_spark.multimodal.imagemeta import parse_wav_header

    assert parse_wav_header(_wav(16000, 1, 16, 16000)) == (16000, 1, 16, 1.0)
    assert parse_wav_header(_wav(44100, 2, 16, 44100)) == (44100, 2, 16, 1.0)
    assert parse_wav_header(b"RIFFxxxxNOPE" + b"\x00" * 40) is None
    assert parse_wav_header(b"") is None


def test_audio_meta_mapinpandas(spark):
    from dislib_spark.multimodal.imagemeta import audio_meta

    rows = [
        ("a.wav", bytearray(_wav(16000, 1, 16, 8000))),
        ("b.png", bytearray(_png(4, 4))),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["path"]: r for r in audio_meta(df).collect()}
    assert got["a.wav"]["sample_rate"] == 16000
    assert got["a.wav"]["duration_s"] == 0.5
    assert got["b.png"]["sample_rate"] is None
