"""Spec-conformant Change Data Feed writes (round 5): DML on tables with
delta.enableChangeDataFeed=true emits `cdc` actions + `_change_data/` files
with `update_preimage`/`update_postimage` labels per the Delta spec's
Change Data Files section; table_changes prefers cdc actions over
add/remove derivation; VACUUMed change files fail fast with a named
version. Also the UPDATE simultaneous-SET semantics fix the CDF work
surfaced (SQL UPDATE evaluates every SET expression and the WHERE against
the ORIGINAL row)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.cdf import table_changes
from athena_delta_lake_spark.delta.dml import (
    delete,
    delete_mor,
    merge_upsert,
    merge_upsert_mor,
    update,
    update_mor,
    vacuum,
)
from athena_delta_lake_spark.delta.log import DeltaLog

CDF_CONF = {"delta.enableChangeDataFeed": "true"}


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "cdf_spec")
    write_delta(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(30)], "id long, k long, v double"
        ),
        path,
        partition_by=["k"],
        configuration=CDF_CONF,
    )
    return path


def _commit_cdc_actions(path: str, v: int) -> list[dict]:
    return [a["cdc"] for a in DeltaLog(path).commit_actions(v) if "cdc" in a]


def test_cdf_protocol_on_create(spark, tbl):
    # legacy CDF writer version per spec
    assert DeltaLog(tbl).snapshot().protocol["minWriterVersion"] >= 4


def test_cdf_enable_via_properties_upgrades_protocol(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import set_table_properties

    path = str(tmp_path / "plain")
    write_delta(spark.range(5).toDF("id"), path)
    set_table_properties(path, CDF_CONF)
    proto = DeltaLog(path).snapshot().protocol
    assert "changeDataFeed" in (proto.get("writerFeatures") or [])


def test_update_emits_labeled_images(spark, tbl):
    update(spark, tbl, {"v": "v + 100"}, "id % 5 = 0")
    assert _commit_cdc_actions(tbl, 1)  # real cdc actions in the log
    ch = table_changes(spark, tbl, 1, 1)
    pre = {r["id"]: r["v"] for r in ch.filter("_change_type = 'update_preimage'").collect()}
    post = {r["id"]: r["v"] for r in ch.filter("_change_type = 'update_postimage'").collect()}
    assert pre == {i: float(i) for i in range(0, 30, 5)}
    assert post == {i: float(i) + 100 for i in range(0, 30, 5)}
    # NO derived churn: kept rows of the rewritten files must not appear
    assert ch.filter("_change_type in ('insert', 'delete')").count() == 0


def test_partial_delete_exact_rows(spark, tbl):
    delete(spark, tbl, "id in (1, 2)")
    ch = table_changes(spark, tbl, 1, 1)
    assert sorted(r["id"] for r in ch.collect()) == [1, 2]
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}


def test_merge_emits_all_labels(spark, tbl):
    src = spark.createDataFrame(
        [(3, 0, 999.0), (100, 1, 1.0), (4, 1, -1.0)],
        "id long, k long, v double",
    )
    merge_upsert(
        spark, tbl, src, ["id"],
        matched_clauses=[("s.v < 0", "delete"), (None, "update")],
    )
    got = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in table_changes(spark, tbl, 1, 1).collect()
    )
    assert got == [
        ("delete", 4, 4.0),
        ("insert", 100, 1.0),
        ("update_postimage", 3, 999.0),
        ("update_preimage", 3, 3.0),
    ]


def test_merge_not_matched_by_source_delete_cdc(spark, tmp_path):
    path = str(tmp_path / "nmbs")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"),
        path,
        configuration=CDF_CONF,
    )
    src = spark.createDataFrame([(3, 30.0), (20, 20.0)], "id long, v double")
    merge_upsert(spark, path, src, ["id"], not_matched_by_source="delete")
    ch = table_changes(spark, path, 1, 1).collect()
    deleted = sorted(r["id"] for r in ch if r["_change_type"] == "delete")
    assert deleted == [i for i in range(10) if i != 3]
    assert sorted(r["id"] for r in ch if r["_change_type"] == "insert") == [20]
    assert [r["id"] for r in ch if r["_change_type"] == "update_preimage"] == [3]


def test_mor_ops_emit_cdc(spark, tmp_path):
    path = str(tmp_path / "mor")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(20)], "id long, v double"),
        path,
        configuration=CDF_CONF,
    )
    delete_mor(spark, path, "id in (0, 5)")
    assert _commit_cdc_actions(path, 1)
    assert sorted(
        r["id"] for r in table_changes(spark, path, 1, 1).collect()
    ) == [0, 5]
    update_mor(spark, path, {"v": "v * 2"}, "id = 7")
    ch = table_changes(spark, path, 2, 2).collect()
    assert sorted((r["_change_type"], r["v"]) for r in ch) == [
        ("update_postimage", 14.0),
        ("update_preimage", 7.0),
    ]
    src = spark.createDataFrame([(8, 0.5), (200, 3.0)], "id long, v double")
    merge_upsert_mor(spark, path, src, ["id"])
    ch3 = table_changes(spark, path, 3, 3).collect()
    assert sorted((r["_change_type"], r["id"]) for r in ch3) == [
        ("insert", 200),
        ("update_postimage", 8),
        ("update_preimage", 8),
    ]


def test_replace_where_boundary_cdc(spark, tmp_path):
    path = str(tmp_path / "rw")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"),
        path,
        configuration=CDF_CONF,
    )
    # non-partition predicate -> boundary-file rewrite -> cdc required
    incoming = spark.createDataFrame([(3, 33.0), (4, 44.0)], "id long, v double")
    write_delta(incoming, path, mode="overwrite", replace_where="id in (3, 4)")
    ch = table_changes(spark, path, 1, 1).collect()
    assert sorted(r["id"] for r in ch if r["_change_type"] == "delete") == [3, 4]
    assert sorted(r["v"] for r in ch if r["_change_type"] == "insert") == [33.0, 44.0]
    # surviving rows (0-2, 5-9) must NOT surface as churn
    assert len(ch) == 4


def test_third_party_cdc_layout_preferred(spark, tmp_path):
    """Hand-built external layout: a commit whose add/remove churn would
    derive WRONG changes, corrected by its cdc action — the reader must
    use the cdc file alone."""
    path = str(tmp_path / "ext")
    os.makedirs(os.path.join(path, "_delta_log"))
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "stage0"))
    f0 = [f for f in os.listdir(tmp_path / "stage0") if f.endswith(".parquet")][0]
    shutil.move(str(tmp_path / "stage0" / f0), os.path.join(path, "part-0.parquet"))
    spark.createDataFrame([(1, 10.0), (2, 99.0)], "id long, v double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "stage1"))
    f1 = [f for f in os.listdir(tmp_path / "stage1") if f.endswith(".parquet")][0]
    shutil.move(str(tmp_path / "stage1" / f1), os.path.join(path, "part-1.parquet"))
    os.makedirs(os.path.join(path, "_change_data"))
    spark.createDataFrame(
        [(2, 20.0, "update_preimage"), (2, 99.0, "update_postimage")],
        "id long, v double, _change_type string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stagec"))
    fc = [f for f in os.listdir(tmp_path / "stagec") if f.endswith(".parquet")][0]
    shutil.move(
        str(tmp_path / "stagec" / fc),
        os.path.join(path, "_change_data", "cdc-0.parquet"),
    )

    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            ],
        }
    )
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}}) + "\n")
        f.write(
            json.dumps(
                {
                    "metaData": {
                        "id": "ext-1",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_str,
                        "partitionColumns": [],
                        "configuration": {"delta.enableChangeDataFeed": "true"},
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-0.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(path, "part-0.parquet")),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {"remove": {"path": "part-0.parquet", "deletionTimestamp": 1, "dataChange": True}}
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-1.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(os.path.join(path, "part-1.parquet")),
                        "modificationTime": 1,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
        f.write(
            json.dumps(
                {
                    "cdc": {
                        "path": "_change_data/cdc-0.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(
                            os.path.join(path, "_change_data", "cdc-0.parquet")
                        ),
                        "dataChange": False,
                    }
                }
            )
            + "\n"
        )
    DeltaLog.clear_cache()
    ch = table_changes(spark, path, 1, 1).collect()
    # cdc wins: exactly the labeled update pair, not whole-file churn
    assert sorted((r["_change_type"], r["id"], r["v"]) for r in ch) == [
        ("update_postimage", 2, 99.0),
        ("update_preimage", 2, 20.0),
    ]
    # the snapshot itself is unaffected by cdc actions
    assert DeltaTable(spark, path).to_df().count() == 2


def test_cdc_partitioned_column_mapped(spark, tmp_path):
    """cdc files under column mapping store PHYSICAL data column names +
    literal _change_type; partitionValues keys are physical too."""
    from athena_delta_lake_spark.delta.writer import enable_column_mapping

    path = str(tmp_path / "cm")
    write_delta(
        spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(10)], "id long, k long, v double"
        ),
        path,
        partition_by=["k"],
        configuration=CDF_CONF,
    )
    enable_column_mapping(path)
    from athena_delta_lake_spark.delta.writer import rename_column

    rename_column(path, "v", "val")
    update(spark, path, {"val": "val + 5"}, "id = 4")
    ch = table_changes(spark, path, 3, 3).collect()
    assert sorted((r["_change_type"], r["val"], r["k"]) for r in ch) == [
        ("update_postimage", 9.0, 0),
        ("update_preimage", 4.0, 0),
    ]


def test_vacuumed_change_file_fails_fast(spark, tmp_path):
    path = str(tmp_path / "vac")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"),
        path,
        configuration=CDF_CONF,
    )
    update(spark, path, {"v": "v + 1"}, "id = 2")
    # simulate an aggressive VACUUM that aged out the change files
    vacuum(path, retention_hours=0.0)
    with pytest.raises(FileNotFoundError, match="DELTA_CHANGE_DATA_FILE_NOT_FOUND"):
        table_changes(spark, path, 1, 1).collect()
    # the current snapshot still reads fine
    assert DeltaTable(spark, path).to_df().count() == 10


def test_vacuumed_removed_file_fails_fast_derived(spark, tmp_path):
    # derivation path (no CDF property): deleted-file read names the version
    path = str(tmp_path / "vac2")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"),
        path,
    )
    delete(spark, path, "id < 3")
    vacuum(path, retention_hours=0.0)
    with pytest.raises(FileNotFoundError, match="DELTA_CHANGE_DATA_FILE_NOT_FOUND"):
        table_changes(spark, path, 1, 1).collect()


# --------------------------------- UPDATE simultaneous-SET semantics fix


def test_update_set_swap(spark, tmp_path):
    path = str(tmp_path / "swap")
    write_delta(spark.createDataFrame([(1, 10, 20)], "id long, a long, b long"), path)
    update(spark, path, {"a": "b", "b": "a"}, "id = 1")
    row = DeltaTable(spark, path).to_df().first()
    assert (row.a, row.b) == (20, 10)  # SQL semantics: swap, not smear


def test_update_set_where_falsified(spark, tmp_path):
    path = str(tmp_path / "falsify")
    write_delta(spark.createDataFrame([(1, 3, 0)], "id long, v long, w long"), path)
    update(spark, path, {"v": "v + 1", "w": "9"}, "v = 3")
    row = DeltaTable(spark, path).to_df().first()
    assert (row.v, row.w) == (4, 9)  # both SETs apply to the original match


def test_update_mor_set_swap(spark, tmp_path):
    path = str(tmp_path / "swapm")
    write_delta(spark.createDataFrame([(1, 10, 20)], "id long, a long, b long"), path)
    update_mor(spark, path, {"a": "b", "b": "a"}, "id = 1")
    row = DeltaTable(spark, path).to_df().first()
    assert (row.a, row.b) == (20, 10)


def test_no_cdf_property_means_no_cdc_actions(spark, tmp_path):
    # tables without the property keep the derivation-only behavior (and
    # the pre-round-5 gates/tests that rely on it)
    path = str(tmp_path / "plain2")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"),
        path,
    )
    update(spark, path, {"v": "v + 1"}, "id = 2")
    assert not _commit_cdc_actions(path, 1)
    ch = table_changes(spark, path, 1, 1)
    # derivation: delete+insert churn of the rewritten file
    assert ch.filter("_change_type = 'insert'").count() >= 1


def test_streaming_change_feed_prefers_cdc(spark, tmp_path):
    """readChangeFeed streaming over a CDF-enabled table: commits with cdc
    actions stream the labeled change files (update_preimage/postimage),
    never the derived whole-file churn."""
    from athena_delta_lake_spark.sources.deltapond_source import (
        register as register_ds,
    )
    from athena_delta_lake_spark.streaming import run_to_memory

    register_ds(spark)
    path = str(tmp_path / "cdc_stream")
    write_delta(
        spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(40)], "id long, p int, v double"
        ),
        path,
        partition_by=["p"],
        configuration=CDF_CONF,
    )  # v0: 40 inserts (blind append -> derivation, no cdc)
    update(spark, path, {"v": "v + 100"}, "id < 4")  # v1: 4 labeled updates
    delete(spark, path, "id in (10, 12)")  # v2: 2 labeled deletes

    stream = (
        spark.readStream.format("deltapond")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    agg = stream.groupBy("_change_type", "_commit_version").count()
    out = {
        (r["_change_type"], r["_commit_version"]): r["count"]
        for r in run_to_memory(agg, "cdc_stream_out", "complete").collect()
    }
    assert out == {
        ("insert", 0): 40,
        ("update_preimage", 1): 4,
        ("update_postimage", 1): 4,
        ("delete", 2): 2,
    }


def test_commit_timestamp_column_opt_in(spark, tmp_path):
    import datetime

    path = str(tmp_path / "cts")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(6)], "id long, v double"),
        path,
        configuration=CDF_CONF,
    )
    update(spark, path, {"v": "v + 1"}, "id = 2")
    # default shape unchanged (two metadata columns)
    ch = table_changes(spark, path, 0, 1)
    assert "_commit_timestamp" not in ch.columns
    # opt-in adds the commit's authoritative time per version
    cht = table_changes(spark, path, 0, 1, include_timestamp=True)
    rows = cht.select("_commit_version", "_commit_timestamp").distinct().collect()
    by_v = {r["_commit_version"]: r["_commit_timestamp"] for r in rows}
    assert set(by_v) == {0, 1}
    assert all(isinstance(t, datetime.datetime) for t in by_v.values())
    assert by_v[0] <= by_v[1]
    want0 = DeltaLog(path).commit_timestamp(0)
    from athena_delta_lake_spark.sqldml import _naive_ts_to_millis

    assert abs(_naive_ts_to_millis(spark, by_v[0]) - want0) < 2000


def test_cdf_truncate_and_replace_commits(spark, tmp_path):
    """TRUNCATE (remove-only) and CREATE OR REPLACE (remove+add overwrite)
    commits are exactly derivable: truncate emits a delete per prior row,
    replace emits deletes of the old content plus inserts of the new."""
    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(10).selectExpr("id"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    pond.sql("TRUNCATE TABLE lake.t")  # v1
    pond.sql("INSERT INTO lake.t SELECT id FROM range(3)")  # v2
    pond.sql(
        "CREATE OR REPLACE TABLE lake.t AS SELECT id * 10 AS id FROM range(2)"
    )  # v3
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in DeltaTable(spark, path).table_changes(1, 3).collect()
    )
    assert got == sorted(
        [(1, "delete", i) for i in range(10)]
        + [(2, "insert", i) for i in range(3)]
        + [(3, "delete", i) for i in range(3)]
        + [(3, "insert", 0), (3, "insert", 10)]
    )
