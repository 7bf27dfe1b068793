"""Multimodal binary-column plumbing: metadata struct, mapInPandas feature
extraction (stubbed codec), frame-sample planning (SURVEY P4)."""

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.operators import multimodal as mm


@pytest.fixture
def media_df(spark):
    return spark.createDataFrame(
        [(1, b"fake-image-bytes-1"), (2, b"fake-image-bytes-22"), (3, None)],
        "media_id long, payload binary",
    )


def test_attach_media_meta(spark, media_df):
    out = mm.attach_media_meta(media_df, "payload", modality="image", fmt="png")
    rows = {r["media_id"]: r["media_meta"] for r in out.collect()}
    assert rows[1]["modality"] == "image" and rows[1]["fmt"] == "png"
    assert rows[1]["n_bytes"] == 18 and rows[2]["n_bytes"] == 19
    assert len(rows[1]["sha256"]) == 64
    assert rows[3]["n_bytes"] is None  # null payload


def test_extract_features_deterministic(spark, media_df):
    out = mm.extract_features(media_df.filter(F.col("payload").isNotNull()), "payload", dim=8)
    rows = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(rows[1]) == 8 and len(rows[2]) == 8
    assert rows[1] != rows[2]
    again = {
        r["media_id"]: r["features"]
        for r in mm.extract_features(
            media_df.filter(F.col("payload").isNotNull()), "payload", dim=8
        ).collect()
    }
    assert rows == again  # deterministic fake features


def test_extract_features_strict_raises(spark, media_df):
    from py4j.protocol import Py4JJavaError

    out = mm.extract_features(media_df, "payload", dim=4, strict=True)
    with pytest.raises(Exception) as e:
        out.collect()
    assert "NotImplementedError" in str(e.value) or isinstance(e.value, Py4JJavaError)


def test_decode_image_stub():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"png")


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, b"x")], "vid long, payload binary")
    df = mm.attach_media_meta(df, "payload", modality="video", fmt="mp4")
    df = df.withColumn(
        "media_meta",
        F.col("media_meta").withField("duration_ms", F.lit(3500).cast("long")),
    )
    out = mm.frame_sample_plan(df, every_ms=1000)
    offsets = [r["frame_offset_ms"] for r in out.collect()]
    assert offsets == [0, 1000, 2000, 3000]


def test_resize_images_updates_meta(spark, media_df):
    from athena_delta_lake_spark.operators.multimodal import (
        attach_media_meta,
        resize_images,
    )

    with_meta = attach_media_meta(media_df, "payload", "image", "png")
    out = resize_images(with_meta, "payload", 224, 224)
    rows = out.select("media_meta.width", "media_meta.height").distinct().collect()
    assert rows == [(224, 224)] or [tuple(r) for r in rows] == [(224, 224)]
    assert out.count() == media_df.count()


def test_resize_images_strict_raises(spark, media_df):
    from athena_delta_lake_spark.operators.multimodal import resize_images

    out = resize_images(media_df, "payload", 64, 64, strict=True)
    import pytest as _pytest

    with _pytest.raises(Exception, match="PIL|NotImplemented"):
        out.collect()


def test_binary_windows_content(spark):
    from athena_delta_lake_spark.operators.multimodal import binary_windows
    from pyspark.sql import functions as F

    payload = bytes(range(100))  # 100 bytes -> windows at 0, 48, 96
    df = spark.createDataFrame([(1, payload), (2, None)], "id long, b binary")
    rows = sorted(
        (r["id"], r["win_id"], r["win_bytes"], r["win_hex"])
        for r in binary_windows(df, "id", "b", window_bytes=64, stride_bytes=48).collect()
    )
    want = [
        (1, 0, 64, bytes(range(0, 64)).hex().upper()),
        (1, 1, 52, bytes(range(48, 100)).hex().upper()),
        (1, 2, 4, bytes(range(96, 100)).hex().upper()),
    ]
    assert rows == want  # null payloads contribute nothing


# --------------------------------------------- real container-header parsing


def _real_png(w, h):
    """A genuinely valid PNG built with stdlib only."""
    import struct
    import zlib

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + b"\x7f" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _real_wav(n_frames, rate=8000, channels=1):
    """A genuinely valid WAV built with the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x01\x02" * n_frames * channels)
    return buf.getvalue()


def _jpeg_with_app0(w, h):
    """Minimal JPEG header stream: SOI + APP0 (to exercise marker skipping)
    + SOF0 carrying the frame dims."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00" * 6
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_media_header_real_binaries():
    png = mm.parse_media_header(_real_png(13, 7))
    assert (png["fmt"], png["width"], png["height"]) == ("png", 13, 7)

    wav = mm.parse_media_header(_real_wav(n_frames=4000, rate=8000))
    assert wav["fmt"] == "wav"
    assert wav["sample_rate"] == 8000
    assert wav["channels"] == 1
    assert wav["duration_ms"] == 500  # 4000 frames @ 8 kHz

    jpg = mm.parse_media_header(_jpeg_with_app0(640, 480))
    assert (jpg["fmt"], jpg["width"], jpg["height"]) == ("jpeg", 640, 480)

    gif = mm.parse_media_header(b"GIF89a" + (17).to_bytes(2, "little") + (5).to_bytes(2, "little") + b"\x00" * 6)
    assert (gif["fmt"], gif["width"], gif["height"]) == ("gif", 17, 5)

    assert mm.parse_media_header(b"not media")["fmt"] is None
    assert mm.parse_media_header(None) is None
    assert mm.parse_media_header(b"")["fmt"] is None


def test_attach_media_meta_parses_headers(spark):
    rows = [
        (0, _real_png(32, 16)),
        (1, _real_wav(16000, rate=16000)),
        (2, _jpeg_with_app0(100, 50)),
        (3, b"opaque"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = mm.attach_media_meta(
        df, "payload", modality="image", fmt="bin", parse_headers=True
    )
    got = {r["id"]: r["media_meta"] for r in out.collect()}
    assert (got[0]["fmt"], got[0]["width"], got[0]["height"]) == ("png", 32, 16)
    assert (got[1]["fmt"], got[1]["duration_ms"]) == ("wav", 1000)
    assert (got[2]["fmt"], got[2]["width"], got[2]["height"]) == ("jpeg", 100, 50)
    assert got[3]["fmt"] == "bin"  # unknown container falls back to declared fmt
    assert got[3]["n_bytes"] == 6


def test_parse_mp4_header_v0_and_v1():
    import struct

    from athena_delta_lake_spark.operators.multimodal import parse_media_header

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    # v0 mvhd: timescale 600, duration 1800 -> 3000 ms
    mvhd0 = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + struct.pack(">II", 600, 1800) + b"\x00" * 80,
    )
    mp4 = box(b"ftyp", b"isom\x00\x00\x02\x00") + box(b"moov", mvhd0)
    out = parse_media_header(mp4)
    assert out["fmt"] == "mp4" and out["duration_ms"] == 3000

    # v1 mvhd: 64-bit creation/modification/duration, timescale 90000
    mvhd1 = box(
        b"mvhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16
        + struct.pack(">I", 90000) + struct.pack(">Q", 450000) + b"\x00" * 80,
    )
    mp4v1 = box(b"ftyp", b"mp42\x00\x00\x00\x00") + box(b"moov", mvhd1)
    out = parse_media_header(mp4v1)
    assert out["fmt"] == "mp4" and out["duration_ms"] == 5000

    # a leading mdat before moov still parses (box walk, not fixed offset)
    mp4_mdat = (
        box(b"ftyp", b"isom\x00\x00\x02\x00")
        + box(b"mdat", b"\xde\xad\xbe\xef" * 8)
        + box(b"moov", mvhd0)
    )
    assert parse_media_header(mp4_mdat)["duration_ms"] == 3000

    # truncated moov: fmt recognized, duration stays None
    trunc = box(b"ftyp", b"isom\x00\x00\x02\x00") + mp4[16:40]
    out = parse_media_header(trunc)
    assert out["fmt"] == "mp4" and out["duration_ms"] is None
