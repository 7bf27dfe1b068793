"""Unit tests for native Delta log replay (SURVEY §5.1) — the code the
reference delegated to delta-standalone (DeltaMetadataHandler.scala:99)."""

import json
import os

import pytest
from pyspark.sql import types as T

from athena_delta_lake_spark.delta.log import DeltaLog, typed_partition_values
from athena_delta_lake_spark.delta.types import (
    cast_partition_value,
    schema_string_to_struct,
)

SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "year", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "val", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _commit(log_dir, version, actions):
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta(partition_columns=None):
    return {
        "metaData": {
            "id": "test",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_STR,
            "partitionColumns": partition_columns or [],
            "configuration": {},
        }
    }


def _add(path, pv=None, stats=None):
    a = {
        "path": path,
        "partitionValues": pv or {},
        "size": 100,
        "modificationTime": 1,
        "dataChange": True,
    }
    if stats:
        a["stats"] = json.dumps(stats)
    return {"add": a}


def test_replay_commits_only(tmp_path):
    log_dir = str(tmp_path / "_delta_log")
    _commit(log_dir, 0, [_meta(), _add("a.parquet"), _add("b.parquet")])
    _commit(log_dir, 1, [_add("c.parquet")])
    snap = DeltaLog(str(tmp_path)).snapshot()
    assert snap.version == 1
    assert sorted(f.path for f in snap.files) == ["a.parquet", "b.parquet", "c.parquet"]
    assert [f.name for f in snap.schema.fields] == ["id", "year", "val"]


def test_add_then_remove_reconciliation(tmp_path):
    log_dir = str(tmp_path / "_delta_log")
    _commit(log_dir, 0, [_meta(), _add("a.parquet"), _add("b.parquet")])
    _commit(log_dir, 1, [{"remove": {"path": "a.parquet", "dataChange": True}}])
    _commit(log_dir, 2, [_add("a.parquet")])  # re-added after remove
    snap = DeltaLog(str(tmp_path)).snapshot()
    assert sorted(f.path for f in snap.files) == ["a.parquet", "b.parquet"]
    # time travel: at v1 only b is live
    snap1 = DeltaLog(str(tmp_path)).snapshot(1)
    assert [f.path for f in snap1.files] == ["b.parquet"]


def test_time_travel_and_cache(tmp_path):
    log_dir = str(tmp_path / "_delta_log")
    _commit(log_dir, 0, [_meta(), _add("a.parquet")])
    _commit(log_dir, 1, [_add("b.parquet")])
    log = DeltaLog(str(tmp_path))
    s0, s1 = log.snapshot(0), log.snapshot(1)
    assert (s0.num_files, s1.num_files) == (1, 2)
    assert log.snapshot(0) is s0  # cached identity


def test_version_gap_raises(tmp_path):
    log_dir = str(tmp_path / "_delta_log")
    _commit(log_dir, 0, [_meta(), _add("a.parquet")])
    _commit(log_dir, 2, [_add("b.parquet")])  # gap: missing v1
    with pytest.raises(ValueError, match="gap"):
        DeltaLog(str(tmp_path)).snapshot()


def test_stats_parsed(tmp_path):
    log_dir = str(tmp_path / "_delta_log")
    stats = {"numRecords": 10, "minValues": {"id": 1}, "maxValues": {"id": 9}, "nullCount": {"id": 0}}
    _commit(log_dir, 0, [_meta(), _add("a.parquet", stats=stats)])
    snap = DeltaLog(str(tmp_path)).snapshot()
    assert snap.files[0].stats["minValues"]["id"] == 1


def test_partition_values_typed_from_schema(tmp_path):
    """Reference wart 4 (SURVEY §1.2): partition values were hard-coded ints;
    here they are cast per the log schema, incl. hive default null."""
    log_dir = str(tmp_path / "_delta_log")
    _commit(
        log_dir,
        0,
        [
            _meta(["year"]),
            _add("year=2021/a.parquet", {"year": "2021"}),
            _add("year=__HIVE_DEFAULT_PARTITION__/b.parquet", {"year": None}),
        ],
    )
    snap = DeltaLog(str(tmp_path)).snapshot()
    assert snap.partition_columns == ["year"]
    vals = sorted(
        (typed_partition_values(f, snap.schema, ["year"]) for f in snap.files),
        key=lambda t: (t[0] is None, t),
    )
    assert vals == [(2021,), (None,)]


def test_url_encoded_paths(tmp_path):
    log_dir = str(tmp_path / "_delta_log")
    _commit(log_dir, 0, [_meta(), _add("part%20one/a%3Db.parquet")])
    snap = DeltaLog(str(tmp_path)).snapshot()
    assert snap.files[0].path == "part one/a=b.parquet"


def test_not_a_delta_table(tmp_path):
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        DeltaLog(str(tmp_path / "nope")).snapshot()


def test_schema_string_full_type_system():
    """The reference supported 11 primitives (README.md:61,
    DeltaMetadataHandler.scala:57-72); the rebuild maps the full system
    including nested types."""
    s = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "s", "type": "string", "nullable": True, "metadata": {}},
                {"name": "b", "type": "boolean", "nullable": True, "metadata": {}},
                {"name": "i8", "type": "byte", "nullable": True, "metadata": {}},
                {"name": "i16", "type": "short", "nullable": True, "metadata": {}},
                {"name": "i32", "type": "integer", "nullable": True, "metadata": {}},
                {"name": "i64", "type": "long", "nullable": True, "metadata": {}},
                {"name": "f32", "type": "float", "nullable": True, "metadata": {}},
                {"name": "f64", "type": "double", "nullable": True, "metadata": {}},
                {"name": "d", "type": "date", "nullable": True, "metadata": {}},
                {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
                {"name": "dec", "type": "decimal(10,2)", "nullable": True, "metadata": {}},
                {"name": "bin", "type": "binary", "nullable": True, "metadata": {}},
                {
                    "name": "arr",
                    "type": {"type": "array", "elementType": "float", "containsNull": True},
                    "nullable": True,
                    "metadata": {},
                },
                {
                    "name": "m",
                    "type": {
                        "type": "map",
                        "keyType": "string",
                        "valueType": "long",
                        "valueContainsNull": True,
                    },
                    "nullable": True,
                    "metadata": {},
                },
                {
                    "name": "st",
                    "type": {
                        "type": "struct",
                        "fields": [
                            {"name": "x", "type": "integer", "nullable": True, "metadata": {}}
                        ],
                    },
                    "nullable": True,
                    "metadata": {},
                },
            ],
        }
    )
    st = schema_string_to_struct(s)
    by = {f.name: f.dataType for f in st.fields}
    assert isinstance(by["dec"], T.DecimalType) and by["dec"].precision == 10
    assert isinstance(by["arr"], T.ArrayType) and isinstance(by["arr"].elementType, T.FloatType)
    assert isinstance(by["m"], T.MapType)
    assert isinstance(by["st"], T.StructType)
    assert isinstance(by["bin"], T.BinaryType)


def test_cast_partition_value_types():
    import datetime

    assert cast_partition_value("7", T.IntegerType()) == 7
    assert cast_partition_value("2021-03-01", T.DateType()) == datetime.date(2021, 3, 1)
    assert cast_partition_value(None, T.IntegerType()) is None
    assert cast_partition_value("__HIVE_DEFAULT_PARTITION__", T.StringType()) is None
    assert cast_partition_value("x y", T.StringType()) == "x y"
    assert cast_partition_value("true", T.BooleanType()) is True


def test_time_travel_by_timestamp(tmp_path):
    import time as _time

    log_dir = str(tmp_path / "_delta_log")
    _commit(log_dir, 0, [_meta(), _add("a.parquet")])
    _time.sleep(0.05)
    t_between = int(_time.time() * 1000)
    _time.sleep(0.05)
    _commit(log_dir, 1, [_add("b.parquet")])
    log = DeltaLog(str(tmp_path))
    snap = log.snapshot_as_of_timestamp(t_between)
    assert snap.version == 0
    now = int(_time.time() * 1000) + 1000
    assert log.snapshot_as_of_timestamp(now).version == 1
    with pytest.raises(ValueError, match="no commit"):
        log.snapshot_as_of_timestamp(0)


def test_files_df_distributed_metadata(spark, tmp_path):
    from athena_delta_lake_spark import DeltaTable, write_delta

    path = str(tmp_path / "fdf")
    write_delta(
        spark.range(100).selectExpr("id", "id % 4 AS p"), path, partition_by=["p"]
    )
    snap = DeltaTable(spark, path).snapshot()
    fdf = snap.files_df(spark)
    rows = fdf.collect()
    assert len(rows) == len(snap.files)
    assert sum(r["num_records"] for r in rows) == 100
    # partition audit runs as a DataFrame op
    per_part = {
        r["partition_values"]["p"]: r["n"]
        for r in fdf.groupBy("partition_values").count().withColumnRenamed("count", "n").collect()
    }
    assert set(per_part) == {"0", "1", "2", "3"}


def test_fast_num_records_ambiguous_key_falls_back():
    """A data column literally named numRecords makes the regex
    ambiguous — _fast_num_records must fall back to a real JSON parse
    and return the TOP-LEVEL count."""
    from athena_delta_lake_spark.delta.log import AddFile, _fast_num_records

    tricky = (
        '{"minValues":{"numRecords":3},"maxValues":{"numRecords":9},'
        '"numRecords":100000,"nullCount":{"numRecords":0}}'
    )
    f = AddFile(
        path="p", partition_values={}, size=1, modification_time=1,
        stats_raw=tricky,
    )
    assert _fast_num_records(f) == 100000
    plain = AddFile(
        path="p", partition_values={}, size=1, modification_time=1,
        stats_raw='{"numRecords":42,"minValues":{"id":0}}',
    )
    assert _fast_num_records(plain) == 42
    assert _fast_num_records(
        AddFile(path="p", partition_values={}, size=1, modification_time=1)
    ) is None
