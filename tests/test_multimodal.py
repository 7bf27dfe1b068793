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
