"""Source formats beyond parquet/Delta (SURVEY §2.B scans: "JSON/CSV
sources are one-line additions" — here they are, schema-explicit).

Every reader takes an explicit schema or uses schema-on-read DDL — never
`inferSchema` over big data (schema inference is a full extra pass at
100 TB; the engine's stance is schemas come from metadata, matching the
reference's log-derived schemas, DeltaMetadataHandler.scala:99-102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options
) -> DataFrame:
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


__all__ = [
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_text",
    "write_csv",
    "write_json",
    "write_orc",
    "write_text",
]


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source: one string column `value` per line."""
    return spark.read.text(path)


def write_text(df: DataFrame, path: str) -> None:
    """Write a single-string-column DataFrame as raw text lines."""
    df.write.mode("overwrite").text(path)
