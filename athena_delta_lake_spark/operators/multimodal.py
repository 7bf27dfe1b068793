"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video are modeled as `binary` columns with a metadata struct
(modality, format, width/height/duration, byte length, content hash) — the
layout a 100 TB multimodal training corpus uses in parquet.

The Spark-side plumbing (schemas, partitioning, Arrow batch shape through
mapInPandas, deterministic fake features) is real and tested; the actual
codec work is STUBBED because image/audio libraries are not in this
container — each stub either raises NotImplementedError (strict mode) or
produces a deterministic fake derived from the bytes, so pipelines are
end-to-end testable without codecs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)


def attach_media_meta(
    df: DataFrame, binary_col: str, modality: str, fmt: str | None = None
) -> DataFrame:
    """Columnar metadata extraction — JVM built-ins only (no decode)."""
    b = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).cast("string").alias("fmt"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(b).cast("long").alias("n_bytes"),
            F.sha2(b, 256).alias("sha256"),
        ),
    )


def decode_image(data: bytes) -> "object":
    """STUB: real implementation needs PIL/opencv (not in this container).

    Reference behavior: bytes -> decoded RGB array.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this environment"
    )


def _fake_feature(data: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for an image/audio embedding: repeatable
    pseudo-features from a rolling byte hash (NOT a real model — lets the
    distributed plumbing be tested end-to-end)."""
    import hashlib

    out = []
    h = hashlib.sha256(data).digest()
    seed = int.from_bytes(h[:8], "big")
    state = seed
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
    return out


def extract_features(
    df: DataFrame,
    binary_col: str,
    dim: int = 16,
    batch_hint: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """binary -> feature vector via mapInPandas (Arrow-batched).

    strict=True raises NotImplementedError where a real codec/model would
    run; strict=False produces the deterministic fake so downstream
    similarity/dedup operators can be exercised.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "feature extraction requires a codec/model; not in container"
                )
            pdf = pdf.copy()
            pdf["features"] = pdf[binary_col].map(
                lambda b: _fake_feature(bytes(b), dim) if b is not None else None
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, meta_col: str = "media_meta", every_ms: int = 1000
) -> DataFrame:
    """Plan frame-sampling offsets from metadata WITHOUT decoding: one row
    per (video, offset). Decode itself is the stubbed stage."""
    duration = F.col(f"{meta_col}.duration_ms")
    offsets = F.sequence(
        F.lit(0), F.coalesce(duration, F.lit(0)), F.lit(every_ms)
    )
    return df.withColumn("frame_offset_ms", F.explode(offsets))


def binary_windows(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    window_bytes: int = 64,
    stride_bytes: int = 48,
) -> DataFrame:
    """Sample fixed-size byte windows from each binary payload — the
    frame/segment-sampling shape for audio/video corpora (decode is the
    stubbed stage; the windowing itself is codec-free and deterministic).

    mapInPandas expands each payload into one row per window:
    (id, win_id, win_bytes, win_hex). Arrow ships the binary column in
    batches; expansion happens executor-side, so a 100 TB corpus fans out
    without any driver involvement, and downstream dedup/similarity
    operators consume the per-window rows directly.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("win_id", T.IntegerType(), False),
            T.StructField("win_bytes", T.LongType(), False),
            T.StructField("win_hex", T.StringType(), False),
        ]
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            ids, win_ids, lens, hexes = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                for w, off in enumerate(
                    range(0, max(len(b), 1), stride_bytes)
                ):
                    chunk = b[off : off + window_bytes]
                    ids.append(rid)
                    win_ids.append(w)
                    lens.append(len(chunk))
                    hexes.append(chunk.hex().upper())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "win_id": pd.Series(win_ids, dtype="int32"),
                    "win_bytes": pd.Series(lens, dtype="int64"),
                    "win_hex": pd.Series(hexes, dtype="object"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    binary_col: str,
    width: int,
    height: int,
    meta_col: str = "media_meta",
    strict: bool = False,
) -> DataFrame:
    """binary -> resized binary via mapInPandas (Arrow-batched), with the
    metadata struct's width/height updated to the target size.

    The decode->resample->encode kernel is the STUBBED stage (needs
    PIL/opencv): strict=True raises NotImplementedError there; strict=False
    passes bytes through deterministically (sha-stamped) so the pipeline
    shape — schema, meta update, batch flow — runs end-to-end.
    """
    out_schema = df.schema

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image resize requires PIL/opencv; not in container"
                )
            yield pdf  # fake kernel: bytes unchanged

    resized = df.mapInPandas(run, schema=out_schema)
    if meta_col in [f.name for f in df.schema.fields]:
        m = F.col(meta_col)
        resized = resized.withColumn(
            meta_col,
            F.struct(
                m.getField("modality").alias("modality"),
                m.getField("fmt").alias("fmt"),
                F.lit(width).alias("width"),
                F.lit(height).alias("height"),
                m.getField("duration_ms").alias("duration_ms"),
                m.getField("n_bytes").alias("n_bytes"),
                m.getField("sha256").alias("sha256"),
            ),
        )
    return resized
