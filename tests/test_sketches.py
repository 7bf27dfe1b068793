"""Count-min sketch guarantees: one-sided error bound, merge exactness,
Delta persistence (operators/sketches.py; a16 is rows-only vs the oracle)."""

from pyspark.sql import functions as F

from athena_delta_lake_spark.operators import sketches
from athena_delta_lake_spark.queries.base import load


def test_cms_never_undercounts_and_bounds_overcount(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    depth, width = 5, 2048
    sk = sketches.cms_build(li, "l_suppkey", depth, width)
    truth = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("true_cnt")
    )
    est = sketches.cms_estimate(sk, truth, "key", depth, width)
    n = li.count()
    eps = 2.718281828 / width
    for r in est.collect():
        assert r["est"] >= r["true_cnt"], "CMS must never undercount"
        # the eps*N bound holds per-row with prob 1-2^-depth; allow 3x slack
        assert r["est"] - r["true_cnt"] <= max(3 * eps * n, 10)


def test_cms_merge_equals_single_pass(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = sketches.cms_merge(
        sketches.cms_build(half_a, "l_suppkey"),
        sketches.cms_build(half_b, "l_suppkey"),
    )
    full = sketches.cms_build(li, "l_suppkey")
    # cell-wise identical: merge is exact summation
    diff = (
        merged.join(full, ["d", "bucket"], "full")
        .filter(
            F.coalesce(merged["cnt"], F.lit(0))
            != F.coalesce(full["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_cms_persisted_as_delta_roundtrip(spark, sf_dir, tmp_path):
    from athena_delta_lake_spark.delta.table import DeltaTable
    from athena_delta_lake_spark.delta.writer import write_delta

    li = load(spark, sf_dir, "lineitem")
    sk = sketches.cms_build(li, "l_suppkey")
    path = str(tmp_path / "cms")
    write_delta(sk, path)
    reread = DeltaTable(spark, path).to_df()
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")
    a = sketches.cms_topk(sk, supp, "s_suppkey", k=5).collect()
    b = sketches.cms_topk(reread, supp, "s_suppkey", k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cms_sketch_is_tiny(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    sk = sketches.cms_build(li, "l_suppkey", depth=5, width=2048)
    assert sk.count() <= 5 * 2048
