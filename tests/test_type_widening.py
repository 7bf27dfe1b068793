"""Type widening (ALTER COLUMN ... TYPE): metadata-only schema widening
with the typeWidening table feature — existing narrow files promote at
scan time, no rewrite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.table import DeltaTable
from athena_delta_lake_spark.delta.writer import alter_column_type


def _mk(spark, path, ddl="a int, b float", rows=((1, 1.5), (2, 2.5))):
    df = spark.createDataFrame(list(rows), ddl)
    write_delta(df, str(path))
    return str(path)


def test_widen_int_to_long_reads_old_files(spark, tmp_path):
    p = _mk(spark, tmp_path / "t1")
    v = alter_column_type(p, "a", "bigint")
    t = DeltaTable(spark, p)
    assert t.schema()["a"].dataType.simpleString() == "bigint"
    got = sorted((r["a"], r["b"]) for r in t.to_df().collect())
    assert got == [(1, 1.5), (2, 2.5)]  # old INT32 files promote at scan
    # appends in the wide type coexist with the narrow files
    write_delta(
        spark.createDataFrame([(2**40, 9.0)], "a long, b float"), p
    )
    assert DeltaTable(spark, p).to_df().filter(F.col("a") > 2**39).count() == 1
    # protocol carries the reader+writer feature
    proto = DeltaLog(p).snapshot().protocol
    assert "typeWidening" in (proto.get("readerFeatures") or [])
    assert "typeWidening" in (proto.get("writerFeatures") or [])
    # the field records the transition
    fld = DeltaTable(spark, p).schema()["a"]
    changes = fld.metadata["delta.typeChanges"]
    assert changes[-1]["fromType"] == "integer"
    assert changes[-1]["toType"] == "long"
    assert changes[-1]["tableVersion"] == v


def test_widen_float_to_double_and_int_to_decimal(spark, tmp_path):
    p = _mk(spark, tmp_path / "t2")
    alter_column_type(p, "b", "double")
    assert DeltaTable(spark, p).schema()["b"].dataType.simpleString() == "double"
    alter_column_type(p, "a", "decimal(12,2)")
    got = {r["a"] for r in DeltaTable(spark, p).to_df().collect()}
    from decimal import Decimal

    assert got == {Decimal("1.00"), Decimal("2.00")}


def test_narrowing_and_bad_targets_rejected(spark, tmp_path):
    p = _mk(spark, tmp_path / "t3")
    for bad in [("a", "short"), ("a", "float"), ("b", "float"), ("a", "decimal(5,0)")]:
        with pytest.raises(ValueError, match="widening"):
            alter_column_type(p, *bad)
    with pytest.raises(ValueError, match="no such column"):
        alter_column_type(p, "zz", "long")


def test_widen_partition_column_rejected(spark, tmp_path):
    path = str(tmp_path / "t4")
    write_delta(
        spark.createDataFrame([(1, 10)], "k int, v int"),
        path,
        partition_by=["k"],
    )
    with pytest.raises(ValueError, match="partition"):
        alter_column_type(path, "k", "long")
    alter_column_type(path, "v", "long")  # data columns fine


def test_widen_then_dml_rewrite(spark, tmp_path):
    """A COW UPDATE after widening rewrites in the wide type and values
    survive exactly."""
    from athena_delta_lake_spark.delta import dml

    p = _mk(spark, tmp_path / "t5")
    alter_column_type(p, "a", "bigint")
    dml.update(spark, p, set={"a": "a + 10"}, where="b > 2.0")
    got = sorted((r["a"], r["b"]) for r in DeltaTable(spark, p).to_df().collect())
    assert got == [(1, 1.5), (12, 2.5)]


def test_widen_via_pond_sql(spark, tmp_path):
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    _mk(spark, os.path.join(root, "lake", "t"))
    pond = DeltaPond(spark, root)
    pond.sql("ALTER TABLE lake.t ALTER COLUMN a TYPE BIGINT")
    assert pond.sql("SELECT sum(a) AS s FROM lake.t").first()["s"] == 3
    d = {
        r["col_name"]: r["data_type"]
        for r in pond.sql("DESCRIBE TABLE lake.t").collect()
    }
    assert d["a"] == "bigint"


def test_widen_stats_pruning_still_exact(spark, tmp_path):
    """min/max stats written as ints keep pruning correctly after the
    column widens (metadata-only count stays exact)."""
    p = str(tmp_path / "t6")
    write_delta(spark.range(0, 100).selectExpr("CAST(id AS INT) AS a"), p)
    write_delta(spark.range(1000, 1100).selectExpr("CAST(id AS INT) AS a"), p)
    alter_column_type(p, "a", "bigint")
    t = DeltaTable(spark, p)
    assert t.count(where="a >= 1000") == 100
    assert t.to_df(where="a >= 1000").count() == 100


def test_widened_table_via_deltapond_source(spark, tmp_path):
    """The deltapond DSv2 reader (pyarrow-based) promotes narrow files to
    the widened schema too."""
    from athena_delta_lake_spark.sources.deltapond_source import register

    register(spark)
    p = str(tmp_path / "dsv2")
    write_delta(
        spark.range(5).selectExpr("CAST(id AS INT) AS a", "CAST(id AS FLOAT) AS b"),
        p,
    )
    alter_column_type(p, "a", "bigint")
    alter_column_type(p, "b", "double")
    df = spark.read.format("deltapond").load(p)
    assert df.schema.simpleString() == "struct<a:bigint,b:double>"
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [
        (i, float(i)) for i in range(5)
    ]
