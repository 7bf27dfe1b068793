"""Driver-contract smoke (SURVEY §5.4 t1): entry() runs, queries() and
oracle_sql() are consistent, every callable yields a schema-stable DataFrame."""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry_mod = importlib.import_module("__spark_entry__")


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns and "l_returnflag" in df.columns


def test_queries_oracle_consistency():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    # every non-oracle query is one of the documented approximate/hash ops
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "k01_approx_distinct",
        "k02_approx_percentile",
        "k03_hll_sketch_union",
        "k04_cms_heavy_hitters",
    }


@pytest.mark.parametrize("name", ["q01_pricing_summary", "w01_topk_per_group", "d02_dedup_keep_first"])
def test_query_schema_stable(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    df1, df2 = fn(spark, sf_dir), fn(spark, sf_dir)
    assert df1.schema == df2.schema
    assert df1.count() == df2.count() > 0


def test_approx_percentile_error_bound(spark, sf_dir):
    """a12 is rows-only vs the oracle; bound its error vs the exact
    percentile here (GK sketch with accuracy=10000 -> rank error ~1e-4)."""
    from pyspark.sql import functions as F

    from athena_delta_lake_spark.queries.base import load

    li = load(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
    )
    for r in both.collect():
        assert abs(r["ap50"] - r["p50"]) / max(abs(r["p50"]), 1e-9) < 0.01
