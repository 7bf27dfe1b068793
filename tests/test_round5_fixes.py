"""Round-5 defect regressions (ADVICE.md round 4):

1. the per-commit writer-protocol gate reads the protocol via a
   validation-free log-tail scan (DeltaLog.latest_protocol), so a table
   whose snapshot() raises (reader-unsupported protocol) still REFUSES
   writes demanding writer features this engine lacks — no blind commits;
2. one precedence rule: a user session temp view wins over a same-named
   pond VIEW (as it already did over pond tables), and create_view refuses
   to hijack an existing session temp view's name;
3. ALTER VIEW RENAME does its existence/collision checks inside the view
   catalog lock: missing src raises cleanly, table-name collisions are
   refused (same rule as create_view), unknown dst schema is refused;
4. SHOW VIEWS filters pond-bound bare temp-view aliases (internal
   plumbing) exactly like SHOW TABLES does;
5. DESCRIBE HISTORY / RESTORE TIMESTAMP AS OF convert between epoch millis
   and naive datetimes using the SESSION timezone, not pinned UTC.
"""

from __future__ import annotations

import datetime
import json
import os
from zoneinfo import ZoneInfo

import pytest

from athena_delta_lake_spark.catalog import DeltaPond
from athena_delta_lake_spark.delta import DeltaLog, write_delta


@pytest.fixture
def pond(spark, tmp_path):
    p = DeltaPond(spark, str(tmp_path / "pond"))
    p.sql("CREATE SCHEMA lake")
    return p


def _append_commit(path: str, actions: list[dict]) -> None:
    log_dir = os.path.join(path, "_delta_log")
    v = DeltaLog(path).latest_version() + 1
    with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    DeltaLog.clear_cache()


# ------------------------------------- 1. no blind commits past a broken read


def _upgrade_to_unknown_feature(path: str) -> None:
    # an external writer upgraded to a feature this engine implements
    # NEITHER side of: snapshot() now raises ValueError (reader check)
    _append_commit(
        path,
        [
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE PROTOCOL"}},
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["futureMagic"],
                    "writerFeatures": ["futureMagic"],
                }
            },
        ],
    )


def test_latest_protocol_skips_reader_validation(spark, tmp_path):
    path = str(tmp_path / "t1")
    write_delta(spark.range(5).toDF("id"), path)
    _upgrade_to_unknown_feature(path)
    with pytest.raises(ValueError, match="futureMagic"):
        DeltaLog(path).snapshot()
    proto = DeltaLog(path).latest_protocol()
    assert proto["writerFeatures"] == ["futureMagic"]


def test_latest_protocol_from_checkpoint(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "t2")
    write_delta(spark.range(5).toDF("id"), path)
    write_delta(spark.range(5).toDF("id"), path, mode="append")
    write_checkpoint(path)
    # protocol lives only in commit 0, below the checkpoint: the tail scan
    # must fall back to the (column-pruned) checkpoint read
    proto = DeltaLog(path).latest_protocol()
    assert proto is not None and "minWriterVersion" in proto


def test_append_refused_when_snapshot_unreadable(spark, tmp_path):
    path = str(tmp_path / "t3")
    write_delta(spark.range(5).toDF("id"), path)
    _upgrade_to_unknown_feature(path)
    df = spark.createDataFrame([(100,)], "id long")
    with pytest.raises(ValueError, match="futureMagic"):
        write_delta(df, path, mode="append")
    with pytest.raises(ValueError, match="futureMagic"):
        write_delta(df, path, mode="overwrite")
    # and no commit landed (v0 = create, v1 = the hostile upgrade)
    assert DeltaLog(path).latest_version() == 1


def test_atomic_commit_gate_sees_real_protocol(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import _atomic_commit

    path = str(tmp_path / "t4")
    write_delta(spark.range(5).toDF("id"), path)
    _upgrade_to_unknown_feature(path)
    with pytest.raises(ValueError, match="futureMagic"):
        _atomic_commit(
            os.path.join(path, "_delta_log"),
            DeltaLog(path).latest_version() + 1,
            [{"commitInfo": {"timestamp": 0, "operation": "TEST"}}],
        )


# --------------------------------------------- 2. one view-precedence rule


def test_user_temp_view_wins_over_pond_view(pond):
    pond.sql("CREATE TABLE lake.pv1 AS SELECT id FROM range(5)")
    pond.create_view("vprec", "SELECT id FROM lake.pv1 WHERE id < 2")
    # a session temp view takes the same bare name
    pond.spark.range(100, 103).toDF("id").createOrReplaceTempView("vprec")
    try:
        rows = pond.sql("SELECT id FROM vprec ORDER BY id").collect()
        assert [r.id for r in rows] == [100, 101, 102]  # temp view won
    finally:
        pond.spark.catalog.dropTempView("vprec")
    rows = pond.sql("SELECT id FROM vprec ORDER BY id").collect()
    assert [r.id for r in rows] == [0, 1]  # pond view reachable again


def test_create_view_refuses_temp_view_hijack(pond):
    pond.sql("CREATE TABLE lake.pv2 AS SELECT id FROM range(5)")
    pond.spark.range(3).toDF("id").createOrReplaceTempView("mine")
    try:
        with pytest.raises(ValueError, match="temp view"):
            pond.create_view("mine", "SELECT id FROM lake.pv2")
    finally:
        pond.spark.catalog.dropTempView("mine")


# ----------------------------------------------- 3. view rename under lock


def test_rename_view_missing_src(pond):
    pond.sql("CREATE TABLE lake.rv0 AS SELECT id FROM range(3)")
    pond.create_view("gone", "SELECT id FROM lake.rv0")
    pond.drop_view("gone")
    with pytest.raises(Exception):
        pond.sql("ALTER VIEW gone RENAME TO elsewhere")


def test_rename_view_onto_table_name_refused(pond):
    pond.sql("CREATE TABLE lake.rv1 AS SELECT id FROM range(3)")
    pond.create_view("rv_view", "SELECT id FROM lake.rv1")
    with pytest.raises(ValueError, match="table named"):
        pond.sql("ALTER VIEW rv_view RENAME TO rv1")
    with pytest.raises(ValueError, match="table named"):
        pond.sql("ALTER VIEW rv_view RENAME TO lake.rv1")
    # the view survives the refused rename
    assert "rv_view" in pond.list_views()


def test_rename_view_unknown_schema_refused(pond):
    pond.sql("CREATE TABLE lake.rv2 AS SELECT id FROM range(3)")
    pond.create_view("rv2_view", "SELECT id FROM lake.rv2")
    with pytest.raises(FileNotFoundError, match="no such schema"):
        pond.sql("ALTER VIEW rv2_view RENAME TO noschema.rv2_view")


# ------------------------------------------- 4. SHOW VIEWS filters plumbing


def test_show_views_hides_pond_bound_aliases(pond):
    pond.sql("CREATE TABLE lake.sv1 AS SELECT id FROM range(3)")
    # bare-name query binds an internal alias 'sv1'
    pond.sql("SELECT * FROM sv1").collect()
    views = {r.viewName for r in pond.sql("SHOW VIEWS").collect()}
    assert "sv1" not in views
    tables = {r.tableName for r in pond.sql("SHOW TABLES").collect()}
    assert "sv1" in tables  # it IS a table — just not also a view


# --------------------------------------------- 5. session-timezone fidelity


def test_describe_history_uses_session_timezone(pond):
    spark = pond.spark
    pond.sql("CREATE TABLE lake.tz1 AS SELECT id FROM range(3)")
    path = pond.table_path("lake", "tz1")
    millis = DeltaLog(path).commit_timestamp(0)
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        # half-hour offset catches sign AND sub-hour errors
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        row = pond.sql("DESCRIBE HISTORY lake.tz1").orderBy("version").first()
        expect = datetime.datetime.fromtimestamp(
            millis / 1000.0, ZoneInfo("Asia/Kolkata")
        ).replace(tzinfo=None, microsecond=0)
        got = row.timestamp.replace(microsecond=0)
        assert abs((got - expect).total_seconds()) <= 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_restore_timestamp_as_of_session_tz(pond):
    spark = pond.spark
    pond.sql("CREATE TABLE lake.tz2 AS SELECT id FROM range(3)")
    import time

    time.sleep(0.2)  # commit-mtime separation (ms resolution)
    pond.sql("INSERT INTO lake.tz2 SELECT id + 10 FROM range(2)")
    path = pond.table_path("lake", "tz2")
    v0_millis = DeltaLog(path).commit_timestamp(0)
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        # literal rendered in the session tz must resolve back to commit 0
        lit = datetime.datetime.fromtimestamp(
            v0_millis / 1000.0, ZoneInfo("Asia/Kolkata")
        ).replace(tzinfo=None)
        pond.sql(
            f"RESTORE TABLE lake.tz2 TO TIMESTAMP AS OF '{lit.isoformat(sep=' ')}'"
        )
        assert pond.sql("SELECT count(*) AS n FROM lake.tz2").first()["n"] == 3
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
