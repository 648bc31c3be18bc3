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


def _box(btype: bytes, payload: bytes) -> bytes:
    import struct as _s

    return _s.pack(">I", 8 + len(payload)) + btype + payload


def _mp4(brand=b"isom", timescale=1000, duration=2500, w=640, h=360):
    import struct as _s

    ftyp = _box(b"ftyp", brand + _s.pack(">I", 0) + b"mp41")
    mvhd = _box(
        b"mvhd",
        bytes(4)  # version+flags
        + bytes(8)  # ctime/mtime
        + _s.pack(">II", timescale, duration)
        + bytes(80),
    )
    tkhd = _box(
        b"tkhd",
        bytes(4) + bytes(8) + _s.pack(">I", 1) + bytes(4)
        + _s.pack(">I", duration) + bytes(8)
        + bytes(2 + 2 + 2 + 2) + bytes(36)
        + _s.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + moov


def test_parse_mp4_header():
    from dislib_spark.multimodal.imagemeta import parse_mp4_header

    got = _mp4(timescale=1000, duration=2500, w=640, h=360)
    brand, dur, w, h = parse_mp4_header(got)
    assert brand == "isom"
    assert abs(dur - 2.5) < 1e-9
    assert (w, h) == (640.0, 360.0)
    assert parse_mp4_header(b"RIFFxxxxWAVE") is None
    assert parse_mp4_header(b"") is None
    # 64-bit largesize box header still walks correctly
    import struct as _s

    big = _s.pack(">I", 1) + b"free" + _s.pack(">Q", 24) + bytes(8)
    assert parse_mp4_header(big + _mp4())[0] == "isom"


def test_video_meta_mapinpandas(spark):
    from dislib_spark.multimodal.imagemeta import video_meta

    rows = [
        ("a.mp4", bytearray(_mp4(duration=1500, w=320, h=240))),
        ("b.bin", bytearray(b"garbage bytes not a container")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r.path: r for r in video_meta(df).collect()}
    assert out["a.mp4"].brand == "isom"
    assert abs(out["a.mp4"].duration_s - 1.5) < 1e-9
    assert out["a.mp4"].width == 320.0
    assert out["b.bin"].brand is None
