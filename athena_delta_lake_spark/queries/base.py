"""Query registry plumbing for the driver contract (__spark_entry__.py).

Each QueryDef pairs a Spark DataFrame builder with (optionally) the
equivalent ANSI SQL for the DuckDB oracle. Column names/aliases MUST match
between the two — the driver sorts columns by name before value-hashing.
Entries without oracle SQL get a weaker rows-only check (reserved for
genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_NANO_TS_COLS: dict[str, list[str]] = {}


def _nano_ts_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot read
    natively (PARQUET_TYPE_ILLEGAL). With spark.sql.legacy.parquet.nanosAsLong
    they arrive as long nanos; load() converts them back to timestamps."""
    if path not in _NANO_TS_COLS:
        import pyarrow as pa
        import pyarrow.parquet as pq

        sch = pq.ParquetFile(path).schema_arrow
        _NANO_TS_COLS[path] = [
            f.name
            for f in sch
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _NANO_TS_COLS[path]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    nano_cols = _nano_ts_cols(path)
    if nano_cols:
        # runtime-settable; required for TIMESTAMP(NANOS) columns regardless
        # of which session the driver hands us
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for c in nano_cols:
        # fixture timestamps are microsecond-aligned; integer division by
        # 1000 is lossless (verified: 0 rows with sub-microsecond parts)
        df = df.withColumn(
            c, F.timestamp_micros((F.col(c) / F.lit(1000)).cast("long"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for queries written in SQL (same names as oracle views)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered views; None -> rows-only
    category: str
    description: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str, category: str, oracle: str | None, description: str = ""
):
    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, category, description)
        return fn

    return deco


def registry() -> dict[str, QueryDef]:
    # import for side effects: each module registers its queries
    from . import (  # noqa: F401
        aggregates,
        bridge_q,
        dedup_q,
        delta_q,
        functions_q,
        multimodal_q,
        pipeline_q,
        relational,
        similarity_q,
        sources_q,
        streaming_q,
        text_q,
        windows,
    )

    return dict(_REGISTRY)
