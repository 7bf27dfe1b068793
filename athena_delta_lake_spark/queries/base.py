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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
        dedup_q,
        functions_q,
        relational,
        similarity_q,
        streaming_q,
        text_q,
        windows,
    )

    return dict(_REGISTRY)
