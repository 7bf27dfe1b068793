"""Type-fidelity round trips through the native write -> log -> scan path:
decimal, binary, arrays, maps, structs, date/timestamp (the types the
reference could NOT serve — SURVEY §1.2), plus approximate-aggregate
quality (HLL error)."""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.queries.base import load


def test_full_type_system_roundtrip(spark, tmp_path):
    path = str(tmp_path / "types_tbl")
    rows = [
        (
            1,
            Decimal("1234.56"),
            b"\x00\x01\xff",
            [1.5, 2.5],
            {"a": 1},
            (42, "x"),
            datetime.date(2021, 3, 1),
            datetime.datetime(2021, 3, 1, 12, 30, 45, 123456),
        ),
        (2, None, None, None, None, None, None, None),
    ]
    schema = (
        "id long, dec decimal(10,2), bin binary, arr array<double>, "
        "m map<string,int>, st struct<a:int,b:string>, d date, ts timestamp"
    )
    df = spark.createDataFrame(rows, schema)
    write_delta(df.coalesce(1), path, partition_by=[])
    out = DeltaTable(spark, path).to_df()
    assert out.schema == df.schema
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["dec"] == Decimal("1234.56")
    assert bytes(got[1]["bin"]) == b"\x00\x01\xff"
    assert got[1]["arr"] == [1.5, 2.5]
    assert got[1]["m"] == {"a": 1}
    assert got[1]["st"]["a"] == 42 and got[1]["st"]["b"] == "x"
    assert got[1]["d"] == datetime.date(2021, 3, 1)
    assert got[1]["ts"] == datetime.datetime(2021, 3, 1, 12, 30, 45, 123456)
    assert all(got[2][c] is None for c in ["dec", "bin", "arr", "m", "st", "d", "ts"])


def test_where_exact_semantics(spark, tmp_path):
    path = str(tmp_path / "where_tbl")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).alias("p"), (F.col("id") * 2).alias("v")
    )
    write_delta(df.repartitionByRange(4, "id"), path, partition_by=["p"])
    t = DeltaTable(spark, path)
    # where= prunes files AND filters rows exactly
    out = t.to_df(where=[("p", "=", 3), ("id", "<", 100)])
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [i for i in range(100) if i % 5 == 3]
    # predicates= is prune-only: returns whole surviving files
    loose = t.to_df(predicates=[("id", "<", 100)])
    assert loose.count() >= 100


def test_approx_count_distinct_error(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey").alias("approx"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("tight"),
    ).collect()[0]
    # default rsd = 0.05 -> 3-sigma bound 15%; rsd=0.01 -> 3%
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.15
    assert abs(row["tight"] - row["exact"]) / row["exact"] < 0.03


def test_exact_percentile_matches_sorted_definition(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    got = df.agg(
        F.percentile("x", F.lit(0.5)).alias("p50"),
        F.percentile("x", F.lit(0.95)).alias("p95"),
    ).collect()[0]
    assert got["p50"] == pytest.approx(50.5)
    assert got["p95"] == pytest.approx(95.05)
