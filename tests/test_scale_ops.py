"""Skew-salting + IVF ANN operators: results must equal their unsalted /
exact counterparts (salting changes the shuffle, never the answer)."""

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.operators import similarity as sim
from athena_delta_lake_spark.operators.scale import salted_join, two_phase_agg, with_salt
from athena_delta_lake_spark.queries.base import load


@pytest.fixture
def skewed(spark):
    # key 0 holds 80% of rows — the classic hot key
    rows = [(0 if i % 5 != 4 else i % 50, i, float(i)) for i in range(5000)]
    return spark.createDataFrame(rows, "k long, id long, v double")


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "k long, name string"
    )
    plain = skewed.join(dim, "k").select("id", "name")
    salted = salted_join(skewed, dim, on=["k"], salt=8).select("id", "name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join(spark, skewed):
    dim = spark.createDataFrame([(0, "zero")], "k long, name string")
    out = salted_join(skewed, dim, on=["k"], salt=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("name").isNull()).count() == skewed.filter(F.col("k") != 0).count()


def test_with_salt_spreads_hot_key(spark, skewed):
    hot = with_salt(skewed.filter(F.col("k") == 0), 8)
    per_salt = hot.groupBy("_salt").count().collect()
    assert len(per_salt) == 8  # all salt buckets used
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 2 * min(counts)  # roughly uniform


def test_two_phase_agg_matches_plain(spark, skewed):
    plain = {
        (r["k"],): (r["n"], r["total"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    two = {
        (r["k"],): (r["n"], r["total"], r["mx"])
        for r in two_phase_agg(
            skewed,
            ["k"],
            {
                "n": (F.count("*"), F.sum("n")),
                "total": (F.sum("v"), F.sum("total")),
                "mx": (F.max("v"), F.max("mx")),
            },
            salt=16,
        ).collect()
    }
    assert plain == two


def test_ivf_ann_recall(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = sim.brute_force_knn(q, e, k=10)
    approx = sim.ivf_ann(q, e, k=10, n_clusters=8, n_probe=4)
    ex = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # full probe == brute force
    full = sim.ivf_ann(q, e, k=10, n_clusters=8, n_probe=8)
    fu = {(r["q_id"], r["vec_id"]) for r in full.collect()}
    assert fu == ex


def test_skyline_known_points(spark):
    """Hand-checkable 2-d skyline (minimize both)."""
    from athena_delta_lake_spark.operators.skyline import skyline

    pts = [(1, 1.0, 9.0), (2, 2.0, 2.0), (3, 9.0, 1.0),
           (4, 3.0, 3.0), (5, 2.0, 2.0), (6, 0.5, 9.5)]
    df = spark.createDataFrame(pts, "id long, x double, y double").repartition(3)
    got = sorted(r["id"] for r in skyline(df, {"x": "min", "y": "min"}).collect())
    # (4) dominated by (2)/(5); duplicates (2,5) both survive (neither
    # strictly dominates the other); (6) not dominated by (1): y worse
    assert got == [1, 2, 3, 5, 6]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key: the sort-merge join reads
    co-located buckets with NO Exchange in the physical plan; the same
    join on unbucketed data shuffles both sides."""
    from athena_delta_lake_spark.operators import scale

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path / 'wh'}'"
    )
    a = spark.range(10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(10_000).selectExpr("id AS k", "id * 3 AS vb")
    try:
        scale.write_bucketed(a, "bktdb.bkt_a", ["k"], n_buckets=8)
        scale.write_bucketed(b, "bktdb.bkt_b", ["k"], n_buckets=8)
        ta, tb = spark.table("bktdb.bkt_a"), spark.table("bktdb.bkt_b")
        # force sort-merge (broadcast would hide the bucketing win on a
        # fixture-sized table); buckets align -> no shuffle exchange
        joined = ta.hint("merge").join(tb.hint("merge"), "k")
        assert scale.is_shuffle_free_join(joined)
        assert joined.count() == 10_000
        # control: the same forced SMJ on unbucketed data shuffles both sides
        assert not scale.is_shuffle_free_join(
            a.hint("merge").join(b.hint("merge"), "k")
        )
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_hll_sketches_merge_and_persist(spark, sf_dir, tmp_path):
    """Per-segment HLL sketches union to a near-exact global distinct, and
    survive a Delta round trip as binary columns — the incremental
    aggregation pattern (store sketches, merge on read, never rescan)."""
    from pyspark.sql import functions as F

    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.queries.base import load

    c = load(spark, sf_dir, "customer")
    exact = c.select("c_custkey").distinct().count()
    sketches = c.groupBy("c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    path = str(tmp_path / "sketch_tbl")
    write_delta(sketches, path)
    merged = (
        DeltaTable(spark, path)
        .to_df()
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    assert abs(merged - exact) / exact < 0.05
