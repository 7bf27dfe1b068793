"""Column-mapping WRITE/DDL support: enable_column_mapping upgrades an
existing table metadata-only (ids + physicalName = current name), after
which RENAME COLUMN and DROP COLUMN are pure metadata commits at any table
size — no data rewrite, which is the only viable shape at 100 TB. Appends,
overwrites, DML rewrites and checkpoints on mapped tables stage files,
hive dirs, partitionValues and stats under PHYSICAL names (Delta spec;
replay normalizes back to logical)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.delta import (
    DeltaLog,
    DeltaTable,
    add_columns,
    drop_column,
    enable_column_mapping,
    rename_column,
    write_checkpoint,
    write_delta,
)
from athena_delta_lake_spark.delta.dml import delete, update


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "cm_tbl")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i), i % 2) for i in range(20)],
        "id long, user string, score double, part int",
    )
    write_delta(df, path, partition_by=["part"])
    return path


def _rows(spark, path, **kw):
    return {
        tuple(r)
        for r in DeltaTable(spark, path).to_df(**kw).collect()
    }


def test_enable_is_metadata_only_and_idempotent(spark, tbl):
    before = _rows(spark, tbl)
    files_before = {f.path for f in DeltaLog(tbl).snapshot().files}
    v = enable_column_mapping(tbl)
    snap = DeltaLog(tbl).snapshot()
    assert {f.path for f in snap.files} == files_before  # no data rewrite
    assert _rows(spark, tbl) == before
    config = snap.metadata["configuration"]
    assert config["delta.columnMapping.mode"] == "name"
    assert int(config["delta.columnMapping.maxColumnId"]) == 4
    assert "columnMapping" in (snap.protocol.get("readerFeatures") or [])
    ids = [
        (f.metadata or {}).get("delta.columnMapping.id")
        for f in snap.schema.fields
    ]
    assert sorted(ids) == [1, 2, 3, 4]
    assert enable_column_mapping(tbl) == v  # idempotent no-op


def test_rename_data_column_and_append(spark, tbl):
    enable_column_mapping(tbl)
    rename_column(tbl, "score", "quality")
    snap = DeltaLog(tbl).snapshot()
    assert [f.name for f in snap.schema.fields] == [
        "id", "user", "quality", "part",
    ]
    # physicalName stays the pre-rename name; old files read unchanged
    f = snap.schema["quality"]
    assert f.metadata["delta.columnMapping.physicalName"] == "score"
    got = _rows(spark, tbl)
    assert (0, "u0", 0.0, 0) in got and len(got) == 20
    # append under the NEW logical name; file on disk stores the physical
    extra = spark.createDataFrame(
        [(100, "u9", 42.5, 0)], "id long, user string, quality double, part int"
    )
    write_delta(extra, tbl, mode="append")
    got = _rows(spark, tbl)
    assert (100, "u9", 42.5, 0) in got and len(got) == 21
    # stats pruning still works through the rename (keys normalized)
    pruned = DeltaTable(spark, tbl).to_df(where="quality > 40.0")
    assert {r["id"] for r in pruned.collect()} == {100}


def test_rename_partition_column(spark, tbl):
    enable_column_mapping(tbl)
    rename_column(tbl, "part", "bucket")
    snap = DeltaLog(tbl).snapshot()
    assert snap.partition_columns == ["bucket"]
    extra = spark.createDataFrame(
        [(200, "u0", 1.0, 7)], "id long, user string, score double, bucket int"
    )
    write_delta(extra, tbl, mode="append")
    # the new file's hive dir uses the PHYSICAL partition name
    assert os.path.isdir(os.path.join(tbl, "part=7"))
    got = _rows(spark, tbl)
    assert (200, "u0", 1.0, 7) in got and len(got) == 21
    # partition pruning on the logical name
    pruned = DeltaTable(spark, tbl).to_df(where="bucket = 7")
    assert {r["id"] for r in pruned.collect()} == {200}


def test_drop_then_readd_fresh_id(spark, tbl):
    from pyspark.sql import types as T

    enable_column_mapping(tbl)
    drop_column(tbl, "score")
    snap = DeltaLog(tbl).snapshot()
    assert [f.name for f in snap.schema.fields] == ["id", "user", "part"]
    assert len(_rows(spark, tbl)) == 20
    # re-adding the same logical name gets a FRESH physical name: old
    # files' dropped bytes must NOT resurrect
    add_columns(tbl, [T.StructField("score", T.DoubleType(), True)])
    snap = DeltaLog(tbl).snapshot()
    f = snap.schema["score"]
    assert f.metadata["delta.columnMapping.physicalName"].startswith("col-")
    assert int(f.metadata["delta.columnMapping.id"]) == 5
    vals = {
        r["score"]
        for r in DeltaTable(spark, tbl).to_df().select("score").collect()
    }
    assert vals == {None}  # never the dropped column's bytes


def test_dml_on_mapped_table(spark, tbl):
    enable_column_mapping(tbl)
    rename_column(tbl, "score", "quality")
    update(spark, tbl, set={"quality": "99.0"}, where="id = 3")
    delete(spark, tbl, where="id = 4")
    got = {r["id"]: r["quality"] for r in DeltaTable(spark, tbl).to_df().collect()}
    assert got[3] == 99.0 and 4 not in got and len(got) == 19


def test_overwrite_preserves_mapping(spark, tbl):
    enable_column_mapping(tbl)
    rename_column(tbl, "score", "quality")
    df = spark.createDataFrame(
        [(1, "x", 1.5, 0)], "id long, user string, quality double, part int"
    )
    write_delta(df, tbl, mode="overwrite", partition_by=["part"])
    snap = DeltaLog(tbl).snapshot()
    assert snap.schema["quality"].metadata["delta.columnMapping.physicalName"] == "score"
    assert snap.metadata["configuration"]["delta.columnMapping.mode"] == "name"
    assert _rows(spark, tbl) == {(1, "x", 1.5, 0)}
    # schema-changing overwrite must go through DDL instead
    bad = spark.createDataFrame([(1, "x")], "id long, other string")
    with pytest.raises(ValueError, match="column-mapped"):
        write_delta(bad, tbl, mode="overwrite")


def test_merge_schema_append_assigns_fresh_ids(spark, tbl):
    enable_column_mapping(tbl)
    extra = spark.createDataFrame(
        [(300, "u1", 3.0, 1, "fr")],
        "id long, user string, score double, part int, lang string",
    )
    write_delta(extra, tbl, mode="append", merge_schema=True)
    snap = DeltaLog(tbl).snapshot()
    f = snap.schema["lang"]
    assert f.metadata["delta.columnMapping.physicalName"].startswith("col-")
    assert int(f.metadata["delta.columnMapping.id"]) == 5
    assert (
        int(snap.metadata["configuration"]["delta.columnMapping.maxColumnId"])
        == 5
    )
    df = DeltaTable(spark, tbl).to_df()
    assert df.filter(F.col("lang") == "fr").count() == 1
    assert df.filter(F.col("lang").isNull()).count() == 20


def test_checkpoint_roundtrip_physical_names(spark, tbl):
    enable_column_mapping(tbl)
    rename_column(tbl, "part", "bucket")
    rename_column(tbl, "score", "quality")
    before = _rows(spark, tbl)
    write_checkpoint(tbl)
    DeltaLog.clear_cache()
    snap = DeltaLog(tbl).snapshot()
    # replay from the checkpoint normalizes physical keys back to logical
    assert all("bucket" in f.partition_values for f in snap.files)
    assert _rows(spark, tbl) == before
    pruned = DeltaTable(spark, tbl).to_df(where="bucket = 1")
    assert all(r["bucket"] == 1 for r in pruned.collect())


def test_ddl_guards(spark, tbl):
    with pytest.raises(ValueError, match="enable_column_mapping"):
        rename_column(tbl, "score", "quality")
    with pytest.raises(ValueError, match="enable_column_mapping"):
        drop_column(tbl, "score")
    enable_column_mapping(tbl)
    with pytest.raises(ValueError, match="already exists"):
        rename_column(tbl, "score", "USER")
    with pytest.raises(ValueError, match="no such column"):
        rename_column(tbl, "nope", "x")
    with pytest.raises(ValueError, match="partition column"):
        drop_column(tbl, "part")
    from athena_delta_lake_spark.delta.writer import add_check_constraint

    add_check_constraint(spark, tbl, "score_pos", "score >= 0")
    with pytest.raises(ValueError, match="referenced by"):
        rename_column(tbl, "score", "quality")
    with pytest.raises(ValueError, match="referenced by"):
        drop_column(tbl, "score")
