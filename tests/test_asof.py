"""As-of join semantics (operator Spark lacks natively; composed from
built-ins) + bucketized range join."""

import datetime

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.operators.asof import (
    asof_join,
    asof_join_pandas,
    range_join_buckets,
)


def _dt(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _dt("2024-01-01 10:00:00")),
            (2, "u1", _dt("2024-01-01 10:05:00")),
            (3, "u1", _dt("2024-01-01 09:00:00")),  # before any right row
            (4, "u2", _dt("2024-01-01 10:00:00")),  # exact tie with right
            (5, "u3", _dt("2024-01-01 12:00:00")),  # key with no right rows
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _dt("2024-01-01 09:30:00"), 100.0),
            ("u1", _dt("2024-01-01 10:03:00"), 200.0),
            ("u2", _dt("2024-01-01 10:00:00"), 300.0),
        ],
        "user_id string, ts timestamp, price double",
    )
    return left, right


def test_asof_backward(spark, sides):
    left, right = sides
    out = {r["event_id"]: r["price"] for r in asof_join(left, right, on="ts", by="user_id").collect()}
    assert out == {1: 100.0, 2: 200.0, 3: None, 4: 300.0, 5: None}


def test_asof_forward(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r["price"]
        for r in asof_join(left, right, on="ts", by="user_id", direction="forward").collect()
    }
    assert out == {1: 200.0, 2: None, 3: 100.0, 4: 300.0, 5: None}


def test_asof_pandas_tolerance(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r["r_price"]
        for r in asof_join_pandas(
            left, right, on="ts", by="user_id", tolerance_seconds=600
        ).collect()
    }
    # 10-minute tolerance: event 1 within 30min of 09:30 -> NO (1800s > 600s)
    assert out == {1: None, 2: 200.0, 3: None, 4: 300.0, 5: None}


def test_range_join_buckets(spark):
    left = spark.createDataFrame(
        [(1, "k", _dt("2024-01-01 10:00:00")), (2, "k", _dt("2024-01-01 10:10:00"))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _dt("2024-01-01 09:58:00"), "r1"),
            ("k", _dt("2024-01-01 09:40:00"), "r2"),
            ("k", _dt("2024-01-01 10:09:00"), "r3"),
        ],
        "k string, rts timestamp, tag string",
    )
    out = range_join_buckets(left, right, "lts", "rts", ["k"], max_gap_seconds=300)
    pairs = {(r["lid"], r["tag"]) for r in out.collect()}
    assert pairs == {(1, "r1"), (2, "r3")}


def test_interval_join_matches_theta_and_avoids_nested_loop(spark):
    from pyspark.sql import functions as F

    from athena_delta_lake_spark.operators.asof import interval_join

    pts = spark.range(0, 2000).select((F.col("id") % 530 + 0.5).alias("v"), "id")
    bands = spark.range(0, 23).select(
        F.col("id").alias("band_id"),
        (F.col("id") * F.col("id")).cast("double").alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1)).cast("double").alias("hi"),
    )
    fast = interval_join(pts, bands, "v", "lo", "hi", bucket_width=25.0)
    naive = pts.alias("P").join(
        bands.alias("I"),
        (F.col("P.v") >= F.col("I.lo")) & (F.col("P.v") < F.col("I.hi")),
    )
    f = {(r["id"], r["band_id"]) for r in fast.select("id", "band_id").collect()}
    n = {(r["id"], r["band_id"]) for r in naive.select("id", "band_id").collect()}
    assert f == n and len(f) > 0

    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in naive_plan  # what we avoided


def test_grouped_ewma_recurrence(spark):
    from athena_delta_lake_spark.operators.asof import grouped_ewma

    rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0)]
    df = spark.createDataFrame(rows, "k string, seq int, x double")
    out = {
        r["k"]: (r["ewma"], r["n"])
        for r in grouped_ewma(df, "k", "x", ["seq"], alpha=0.5).collect()
    }
    # a: y=10 -> .5*10+.5*20=15 -> .5*15+.5*30=22.5
    assert out["a"] == (22.5, 3)
    assert out["b"] == (5.0, 1)
