"""Source-format round trips through the gate: CSV and JSON readers with
explicit schemas (SURVEY §2.B scans — formats beyond the reference's
parquet-only surface).

Each query materializes the fixture in the alternate format once per sf
under /tmp, reads it back through sources.read_*, and aggregates; the
oracle runs the same aggregate over the original parquet — so a format
round-trip bug (quoting, null encoding, type parsing) breaks the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sources
from .base import load, register

_ROOT = "/tmp/adls_source_fixtures"

_SUPPLIER_SCHEMA = (
    "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
)
_PART_SCHEMA = (
    "p_partkey bigint, p_name string, p_brand string, p_type string, "
    "p_size bigint, p_retailprice double"
)


def _tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def _ensure_csv_supplier(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(_ROOT, _tag(sf_dir), "supplier_csv")
    if not os.path.isdir(path):
        sources.write_csv(load(spark, sf_dir, "supplier"), path)
    return path


def _ensure_json_part(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(_ROOT, _tag(sf_dir), "part_json")
    if not os.path.isdir(path):
        sources.write_json(load(spark, sf_dir, "part"), path)
    return path


@register(
    "c01_csv_source",
    "source",
    """
    SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM supplier GROUP BY s_nationkey
    """,
    "CSV round trip: write supplier as CSV, read with explicit schema, aggregate",
)
def c01(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_csv_supplier(spark, sf_dir)
    df = sources.read_csv(spark, path, _SUPPLIER_SCHEMA)
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n"), F.round(F.sum("s_acctbal"), 2).alias("bal")
    )


def _ensure_orc_customer(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(_ROOT, _tag(sf_dir), "customer_orc")
    if not os.path.isdir(path):
        sources.write_orc(load(spark, sf_dir, "customer"), path)
    return path


@register(
    "c03_orc_source",
    "source",
    """
    SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """,
    "ORC round trip: write customer as ORC, read back, aggregate; oracle runs "
    "on the original parquet so an ORC encode/decode bug breaks the hash",
)
def c03(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_orc_customer(spark, sf_dir)
    df = sources.read_orc(spark, path)
    return df.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
    )


@register(
    "c02_json_source",
    "source",
    """
    SELECT p_brand, count(*) AS n, max(p_retailprice) AS max_price
    FROM part GROUP BY p_brand
    """,
    "JSON round trip: write part as JSON lines, read with explicit schema, aggregate",
)
def c02(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_json_part(spark, sf_dir)
    df = sources.read_json(spark, path, _PART_SCHEMA)
    return df.groupBy("p_brand").agg(
        F.count("*").alias("n"), F.max("p_retailprice").alias("max_price")
    )


def _ensure_text_docs(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(_ROOT, _tag(sf_dir), "docs_text")
    if not os.path.isdir(path):
        lines = load(spark, sf_dir, "documents").select(
            F.concat_ws(
                "|", F.col("doc_id").cast("string"), F.col("lang"), F.md5("text")
            ).alias("value")
        )
        sources.write_text(lines, path)
    return path


@register(
    "c04_text_source",
    "source",
    """
    SELECT lang, count(*) AS n, min(md5(text)) AS min_hash, max(md5(text)) AS max_hash
    FROM documents GROUP BY lang
    """,
    "raw text-line round trip: write doc_id|lang|md5 lines, read + parse back",
)
def c04(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _ensure_text_docs(spark, sf_dir)
    lines = sources.read_text(spark, path)
    parts = F.split("value", r"\|")
    parsed = lines.select(
        parts.getItem(1).alias("lang"), parts.getItem(2).alias("h")
    )
    return parsed.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.min("h").alias("min_hash"),
        F.max("h").alias("max_hash"),
    )
