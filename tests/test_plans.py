"""Plan-shape assertions (SURVEY P6: the 100 TB design review as tests).

These lock in the optimizer behaviors the engine depends on: filters pushed
to the parquet scan, column pruning in ReadSchema, dims broadcast (no
sort-merge join for star shapes), top-k planned as TakeOrderedAndProject,
partition filters on hive-layout scans.
"""

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.plans import explain_summary
from athena_delta_lake_spark.queries import registry
from athena_delta_lake_spark.queries.base import load


@pytest.fixture(scope="module")
def reg():
    return registry()


def test_filter_pushdown_and_column_pruning(spark, sf_dir, reg):
    s = explain_summary(reg["q02_filter_project"].fn(spark, sf_dir))
    assert s.pushed_filters, "filters must reach the parquet scan"
    assert any("l_quantity" in f for f in s.pushed_filters)
    # projection of 3 derived cols must NOT read all 11 lineitem columns
    assert s.read_schemas and "l_returnflag" not in s.read_schemas[0]
    assert "l_quantity" in s.read_schemas[0]


def test_star_join_broadcasts_dims(spark, sf_dir, reg):
    s = explain_summary(reg["q05_local_supplier_volume"].fn(spark, sf_dir))
    assert s.broadcast_hash_joins >= 4, s.raw[:2000]
    assert s.sort_merge_joins == 0


def test_topk_plans_take_ordered(spark, sf_dir, reg):
    s = explain_summary(reg["q03_top_orders"].fn(spark, sf_dir))
    assert s.take_ordered, "order+limit must plan TakeOrderedAndProject"


def test_agg_partial_before_shuffle(spark, sf_dir, reg):
    s = explain_summary(reg["q01_pricing_summary"].fn(spark, sf_dir))
    # partial + final hash aggregate pair
    assert s.hash_aggregates >= 2
    assert s.shuffle_exchanges >= 1


def test_embedding_scoring_is_arrow_not_rowpython(spark, sf_dir, reg):
    s = explain_summary(reg["n01_knn_brute_force"].fn(spark, sf_dir))
    assert s.python_evals >= 1
    assert "ArrowEvalPython" in s.raw, "pandas UDF must run via Arrow"
    assert "BatchEvalPython" not in s.raw, "no row-at-a-time Python in hot path"


def test_delta_scan_partition_filters(spark, sf_dir):
    """Hive-layout Delta scan: a partition predicate lands in
    PartitionFilters (metadata-only), not in the data filter."""
    from athena_delta_lake_spark.delta.table import DeltaTable
    from athena_delta_lake_spark.queries.delta_q import _ensure_lineitem_delta

    path = _ensure_lineitem_delta(spark, sf_dir)
    df = DeltaTable(spark, path).to_df().filter(F.col("l_returnflag") == "R")
    s = explain_summary(df)
    assert any("l_returnflag" in f for f in s.partition_filters), s.raw[:1500]
