"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on sf0.001 (smoke check)
queries()      -> name -> callable(spark, sf_dir) -> DataFrame
oracle_sql()   -> name -> equivalent DuckDB SQL (omitted for the few
                  genuinely non-SQL-expressible ops -> rows-only check)

All implementations live in athena_delta_lake_spark/ (engine core: native
Delta snapshot + catalog; query surface: queries/ package).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from athena_delta_lake_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary over sf0.001."""
    q = registry()["q01_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in sorted(registry().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle
        for name, qd in sorted(registry().items())
        if qd.oracle is not None
    }
