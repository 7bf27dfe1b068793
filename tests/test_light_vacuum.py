"""VACUUM through the driver-light plane (round-8 verdict "What's missing
#1", last residue).

Past ADLS_LIGHT_PLANNING_FILES the live set never materializes on the
driver: the expired storage listing is spooled to a local temp file, the
unreferenced-file anti-join (live files + executor-derived DV blob paths)
runs as a Spark job, and the deletes fan out over executors through the
fs facade. Twin-table tests assert the light path reaps EXACTLY the
classic doomed set, preserves live data and live DV blobs, and honors
dry_run + the capped `files` sample contract.
"""

import os

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta import dml
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import write_checkpoint


def _mk_garbage_table(spark, path):
    """A table with real garbage: an overwritten generation, a COW
    delete's rewritten victims, and a purged DV blob — all unreferenced;
    plus a LIVE DV that vacuum must keep."""
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(200)],
        "id long, part int, v double",
    )
    write_delta(df.coalesce(1), path, partition_by=["part"])  # v0
    write_delta(df.coalesce(1), path, mode="overwrite", partition_by=["part"])
    t = DeltaTable(spark, path)
    t.delete(where="id % 50 = 0")  # COW: rewrites -> old files garbage
    t.delete(where="id % 41 = 0", mode="mor")  # live DV blob
    write_checkpoint(path)
    write_delta(  # post-checkpoint overlay
        spark.createDataFrame(
            [(900 + i, i % 4, -2.0) for i in range(8)],
            "id long, part int, v double",
        ).coalesce(1),
        path,
        mode="append",
    )
    DeltaLog.clear_cache()


def _rows(spark, path):
    return sorted(tuple(r) for r in DeltaTable(spark, path).to_df().collect())


def test_light_vacuum_equals_classic(spark, tmp_path, monkeypatch):
    import shutil

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk_garbage_table(spark, a)
    shutil.copytree(a, b)  # byte-identical twin: doomed lists comparable
    DeltaLog.clear_cache()
    want = _rows(spark, a)
    res_c = dml.vacuum(a, retention_hours=0)
    assert res_c["planning"] == "classic" and res_c["files"]

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(b).light_planning_engaged()
    res_l = dml.vacuum(b, retention_hours=0, spark=spark)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    assert res_l["planning"] == "light"
    assert res_l["truncated"] is False
    assert res_l["files"] == res_c["files"]  # identical doomed sets
    assert res_l["files_count"] == len(res_c["files"])
    # garbage physically gone, live data + live DV intact
    for rel in res_l["files"]:
        assert not os.path.exists(os.path.join(b, rel))
    DeltaLog.clear_cache()
    assert _rows(spark, b) == want
    assert any(f.deletion_vector for f in DeltaLog(b).snapshot().files)


def test_light_vacuum_dry_run(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "dry")
    _mk_garbage_table(spark, path)
    classic_dry = dml.vacuum(path, retention_hours=0, dry_run=True)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    res = dml.vacuum(path, retention_hours=0, dry_run=True, spark=spark)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    assert res["deleted"] is False
    assert res["files"] == classic_dry["files"]
    for rel in res["files"]:  # nothing touched
        assert os.path.exists(os.path.join(path, rel))


def test_light_vacuum_retention_window(spark, tmp_path, monkeypatch):
    """Fresh garbage inside the retention window survives the light path
    exactly as it does classic."""
    path = str(tmp_path / "ret")
    _mk_garbage_table(spark, path)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    res = dml.vacuum(path, retention_hours=1.0, spark=spark)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    assert res["planning"] == "light"
    assert res["files_count"] == 0  # everything is younger than 1h
    DeltaLog.clear_cache()
    assert DeltaTable(spark, path).to_df().count() == 200


def test_light_vacuum_capped_sample(spark, tmp_path, monkeypatch):
    """files_count past the cap: the sample is truncated but every doomed
    file is still deleted."""
    path = str(tmp_path / "cap")
    _mk_garbage_table(spark, path)
    n_doomed = len(dml.vacuum(path, retention_hours=0, dry_run=True)["files"])
    assert n_doomed > 3
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setenv("ADLS_LIGHT_COLLECT_CAP", "3")
    res = dml.vacuum(path, retention_hours=0, spark=spark)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    monkeypatch.delenv("ADLS_LIGHT_COLLECT_CAP")
    assert res["truncated"] is True
    assert len(res["files"]) == 3
    assert res["files_count"] == n_doomed
    # deletion was NOT capped
    left = dml.vacuum(path, retention_hours=0, dry_run=True)
    assert left["files"] == []


def test_light_vacuum_via_sql_call(spark, tmp_path, monkeypatch):
    """CALL vacuum routes through the light path with pond.spark."""
    from athena_delta_lake_spark import DeltaPond

    root = str(tmp_path)
    path = os.path.join(root, "lake", "g")
    _mk_garbage_table(spark, path)
    pond = DeltaPond(spark, root)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    out = pond.sql("CALL vacuum(tbl => 'lake.g', retention_hours => 0)")
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    assert out.count() >= 1
    DeltaLog.clear_cache()
    assert DeltaTable(spark, path).to_df().count() == 200


def test_light_vacuum_remote_branch(spark, tmp_path, monkeypatch):
    """REMOTE-scheme code path (round-9 review): executors cannot build
    HadoopFS (no py4j gateway in a Python worker), so the spool must
    stage into `_delta_log/.tmp/` — readable by every executor through
    the table's own scheme — and the deletes must run from a driver
    thread pool, never from get_fs() inside a task. Forced here by
    stubbing executor_fs_safe; results must equal the classic reap."""
    import shutil

    from athena_delta_lake_spark.delta import fs as fsmod

    a, b = str(tmp_path / "ra"), str(tmp_path / "rb")
    _mk_garbage_table(spark, a)
    shutil.copytree(a, b)
    DeltaLog.clear_cache()
    want = _rows(spark, a)
    res_c = dml.vacuum(a, retention_hours=0)
    assert res_c["files"]

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setattr(fsmod, "executor_fs_safe", lambda p: False)
    res_l = dml.vacuum(b, retention_hours=0, spark=spark)
    assert res_l["planning"] == "light"
    assert res_l["files"] == res_c["files"]
    for rel in res_l["files"]:
        assert not os.path.exists(os.path.join(b, rel))
    # the staged spool is cleaned up
    tmp_dir = os.path.join(b, "_delta_log", ".tmp")
    assert not os.path.exists(tmp_dir) or not os.listdir(tmp_dir)
    DeltaLog.clear_cache()
    assert _rows(spark, b) == want
