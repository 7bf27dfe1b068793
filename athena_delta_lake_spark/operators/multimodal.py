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

import pandas as pd
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


_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

# JPEG SOF markers that carry frame dimensions (all SOFn except DHT/DAC/JPG)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_media_header(data) -> dict | None:
    """Best-effort container-header parse, pure stdlib — REAL decoding of
    the metadata the formats put up front (magic + fixed/walked chunks),
    no codec needed: PNG IHDR, JPEG SOFn marker walk, GIF logical screen,
    BMP info header, RIFF/WAVE fmt+data chunk walk. Returns
    {fmt, width, height, duration_ms, sample_rate, channels} with None for
    fields the container doesn't carry, or all-None fmt for unknown bytes.
    Payload bytes beyond the header are never touched."""
    import struct

    if data is None:
        return None
    b = bytes(data)
    out = {
        "fmt": None, "width": None, "height": None,
        "duration_ms": None, "sample_rate": None, "channels": None,
    }
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        out["fmt"] = "png"
        w, h = struct.unpack(">II", b[16:24])
        out["width"], out["height"] = int(w), int(h)
    elif b[:2] == b"\xff\xd8":
        out["fmt"] = "jpeg"
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone markers have no length field
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    out["height"], out["width"] = int(h), int(w)
                break
            if marker == 0xDA:  # start of scan: entropy data, stop walking
                break
            i += 2 + seg_len
    elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        out["fmt"] = "gif"
        w, h = struct.unpack("<HH", b[6:10])
        out["width"], out["height"] = int(w), int(h)
    elif b[:2] == b"BM" and len(b) >= 26:
        out["fmt"] = "bmp"
        w, h = struct.unpack("<ii", b[18:26])
        out["width"], out["height"] = int(w), abs(int(h))  # h<0 = top-down rows
    elif len(b) >= 16 and b[4:8] == b"ftyp":
        # ISO-BMFF (MP4/MOV/3GP...): top-level box walk to moov, then to
        # mvhd for timescale + duration (v0: 32-bit fields at +12/+16
        # after the version/flags word; v1: 64-bit at +20/+24)
        out["fmt"] = "mp4"

        def _boxes(off: int, end: int):
            while off + 8 <= end:
                size = struct.unpack(">I", b[off : off + 4])[0]
                if size < 8:
                    return
                yield b[off + 4 : off + 8], off + 8, min(off + size, end)
                off += size

        for typ, s, e in _boxes(0, len(b)):
            if typ != b"moov":
                continue
            for t2, s2, e2 in _boxes(s, e):
                if t2 == b"mvhd" and e2 - s2 >= 20:
                    ver = b[s2]
                    if ver == 1 and e2 - s2 >= 32:
                        timescale = struct.unpack(">I", b[s2 + 20 : s2 + 24])[0]
                        duration = struct.unpack(">Q", b[s2 + 24 : s2 + 32])[0]
                    else:
                        timescale = struct.unpack(">I", b[s2 + 12 : s2 + 16])[0]
                        duration = struct.unpack(">I", b[s2 + 16 : s2 + 20])[0]
                    if timescale:
                        out["duration_ms"] = int(duration * 1000 // timescale)
                    break
            break
    elif b[:4] == b"RIFF" and len(b) >= 12 and b[8:12] == b"WAVE":
        out["fmt"] = "wav"
        i, byte_rate, data_size = 12, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            csz = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 20 <= len(b):
                channels, sample_rate, byte_rate = struct.unpack(
                    "<HII", b[i + 10 : i + 20]
                )
                out["sample_rate"] = int(sample_rate)
                out["channels"] = int(channels)
            elif cid == b"data":
                data_size = csz
            i += 8 + csz + (csz & 1)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            out["duration_ms"] = int(data_size * 1000 // byte_rate)
    return out


def media_header_udf() -> Column:
    """Arrow-batched header parser as a column factory: call the result on
    a binary column. Header parsing reads a bounded prefix per row —
    per-row Python cost is O(header), not O(payload)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_HEADER_SCHEMA)
    def _parse(col: pd.Series) -> pd.DataFrame:
        rows = [
            parse_media_header(v)
            or {k.name: None for k in _HEADER_SCHEMA.fields}
            for v in col
        ]
        return pd.DataFrame(rows, columns=[f.name for f in _HEADER_SCHEMA.fields])

    return _parse


def attach_media_meta(
    df: DataFrame,
    binary_col: str,
    modality: str,
    fmt: str | None = None,
    parse_headers: bool = False,
) -> DataFrame:
    """Columnar metadata extraction. Byte length and content hash are JVM
    built-ins; with parse_headers=True the container headers are really
    parsed (parse_media_header via an Arrow-batched pandas_udf) and fill
    fmt/width/height/duration_ms — no codec involved, so this works in any
    environment. parse_headers=False keeps the plan 100% JVM-side."""
    b = F.col(binary_col)
    if parse_headers:
        hdr = media_header_udf()(b)
        fmt_col = F.coalesce(hdr.getField("fmt"), F.lit(fmt).cast("string"))
        width = hdr.getField("width")
        height = hdr.getField("height")
        duration = hdr.getField("duration_ms")
    else:
        fmt_col = F.lit(fmt).cast("string")
        width = F.lit(None).cast("int")
        height = F.lit(None).cast("int")
        duration = F.lit(None).cast("long")
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            fmt_col.alias("fmt"),
            width.cast("int").alias("width"),
            height.cast("int").alias("height"),
            duration.cast("long").alias("duration_ms"),
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
