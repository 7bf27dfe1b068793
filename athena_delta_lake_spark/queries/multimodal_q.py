"""Multimodal header-decode gate: REAL container-header parsing
(operators/multimodal.py: parse_media_header) driven at fixture scale.

The fixture set carries no media binaries, so the gate synthesizes valid
PNG and WAV headers per document — entirely with JVM byte-builtins
(hex/unhex/shift), deterministic from (doc_id, n_chars) — then parses them
back through the Arrow-batched header UDF. The DuckDB oracle computes the
expected dimensions/durations arithmetically from the same columns, so a
parser or construction bug on either field breaks the value hash. The
parser itself is validated against genuinely-encoded binaries (stdlib
zlib-PNG, wave-module WAV) in tests/test_multimodal.py.

Named b01_* so it sorts into the driver's budgeted correctness window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_media_meta
from .base import load, register


def _byte(col: Column, i: int) -> Column:
    """i-th little-endian byte of an integer column as a 1-byte binary."""
    return F.unhex(
        F.lpad(F.hex(F.shiftright(col.cast("long"), 8 * i).bitwiseAND(F.lit(255))), 2, "0")
    )


def _le(col: Column, n: int) -> Column:
    return F.concat(*[_byte(col, i) for i in range(n)])


def _be(col: Column, n: int) -> Column:
    return F.concat(*[_byte(col, i) for i in reversed(range(n))])


def _hex_lit(s: str) -> Column:
    return F.unhex(F.lit(s))


@register(
    "b01_media_headers",
    "multimodal",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS fmt,
           CASE WHEN doc_id % 2 = 0 THEN CAST(n_chars % 1000 + 1 AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 500 + 1 AS INT) END AS height,
           CASE WHEN doc_id % 2 = 1
                THEN CAST((doc_id % 100 + 1) * 10 AS BIGINT) END AS duration_ms
    FROM documents
    """,
    "real PNG/WAV container-header parsing over synthesized binary payloads",
)
def b01(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    width = (F.col("n_chars") % 1000 + 1).cast("long")
    height = (F.col("doc_id") % 500 + 1).cast("long")
    # PNG: magic + IHDR length/tag + big-endian dims + bit-depth tail
    png = F.concat(
        _hex_lit("89504E470D0A1A0A"),
        _hex_lit("0000000D"),
        _hex_lit("49484452"),  # "IHDR"
        _be(width, 4),
        _be(height, 4),
        _hex_lit("0800000000"),
    )
    # WAV: canonical RIFF/WAVE with fmt chunk (8 kHz mono s16) + data chunk
    data_size = ((F.col("doc_id") % 100 + 1) * 160).cast("long")  # 10ms units
    wav = F.concat(
        _hex_lit("52494646"),  # "RIFF"
        _le(data_size + 36, 4),
        _hex_lit("57415645"),  # "WAVE"
        _hex_lit("666D7420"),  # "fmt "
        _le(F.lit(16), 4),
        _le(F.lit(1), 2),      # PCM
        _le(F.lit(1), 2),      # mono
        _le(F.lit(8000), 4),   # sample rate
        _le(F.lit(16000), 4),  # byte rate
        _le(F.lit(2), 2),      # block align
        _le(F.lit(16), 2),     # bits/sample
        _hex_lit("64617461"),  # "data"
        _le(data_size, 4),
        F.encode(F.repeat(F.lit("x"), data_size.cast("int")), "UTF-8"),
    )
    payload = F.when(F.col("doc_id") % 2 == 0, png).otherwise(wav)
    out = attach_media_meta(
        d.withColumn("payload", payload),
        "payload",
        modality="media",
        parse_headers=True,
    )
    return out.select(
        "doc_id",
        F.col("media_meta.fmt").alias("fmt"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
    )


@register(
    "g04_mp4_headers",
    "multimodal",
    """
    SELECT doc_id, 'mp4' AS fmt,
           CAST(((doc_id % 997) + 1) * 2 AS BIGINT) AS duration_ms
    FROM documents
    """,
    "real ISO-BMFF (MP4) box-walk parsing — ftyp + moov/mvhd synthesized "
    "per document with JVM byte-builtins (timescale 500), duration "
    "recovered via the Arrow-batched header UDF; oracle is arithmetic",
)
def g04(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    dur = (F.col("doc_id") % 997 + 1).cast("long")
    # ftyp box: size 16, brand isom, minor 0
    ftyp = F.concat(
        _be(F.lit(16), 4), _hex_lit("66747970"), _hex_lit("69736F6D"),
        _be(F.lit(0), 4),
    )
    # mvhd v0: 8B header + version/flags + creation + modification +
    # timescale + duration + 80B of rate/volume/reserved/matrix/next_track
    mvhd = F.concat(
        _be(F.lit(108), 4), _hex_lit("6D766864"),
        _be(F.lit(0), 4),    # version 0 + flags
        _be(F.lit(0), 4),    # creation
        _be(F.lit(0), 4),    # modification
        _be(F.lit(500), 4),  # timescale: 500 ticks/s -> ms = ticks * 2
        _be(dur, 4),         # duration in ticks
        _hex_lit("00" * 80),
    )
    moov = F.concat(_be(F.lit(116), 4), _hex_lit("6D6F6F76"), mvhd)
    out = attach_media_meta(
        d.withColumn("payload", F.concat(ftyp, moov)),
        "payload",
        modality="media",
        parse_headers=True,
    )
    return out.select(
        "doc_id",
        F.col("media_meta.fmt").alias("fmt"),
        F.col("media_meta.duration_ms").cast("long").alias("duration_ms"),
    )
