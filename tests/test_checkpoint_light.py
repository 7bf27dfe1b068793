"""Distributed (driver-light) checkpoint writing (round-8 verdict ask #5).

Past ADLS_LIGHT_PLANNING_FILES, write_checkpoint stops folding every
AddFile through pyarrow driver-side (8.5 GiB RSS at 10^7 adds,
tools/meta_scale.py): add actions stream from LightSnapshot.files_df
EXECUTOR-side into the checkpoint parquet (classic part files named by
task partition id, or V2 uuid sidecars), and the driver holds only the
header plus one (name, size, count) row per part.

These tests force the threshold low and assert the light writer is
REPLAY-IDENTICAL to the classic writer on twin copies of the same table
— every AddFile field (stats, DV descriptor, row-tracking, physical
partition keys on column-mapped tables) and the scanned rows — across
single-file, multi-part, and V2 layouts.
"""

import json
import os
import shutil

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import (
    enable_column_mapping,
    rename_column,
    write_checkpoint,
)


def _mk_table(spark, path, mapped=False, dv=False, rowtrack=False):
    df = spark.createDataFrame(
        [(i, i % 8, float(i), f"s{i}") for i in range(400)],
        "id long, part int, v double, name string",
    )
    cfg = {"delta.enableRowTracking": "true"} if rowtrack else None
    write_delta(df, path, partition_by=["part"], configuration=cfg)
    if mapped:
        enable_column_mapping(path)
        rename_column(path, "v", "val")
        rename_column(path, "val", "v")  # same logical name, mapped physical
    if dv:
        DeltaTable(spark, path).delete(where="id % 37 = 0", mode="mor")
    write_checkpoint(path)  # pre-threshold: classic, seeds _last_checkpoint
    # post-checkpoint tail: overlay adds exercised by the light files_df
    write_delta(
        spark.createDataFrame(
            [(1000 + i, i % 8, -1.0, "tail") for i in range(16)],
            "id long, part int, v double, name string",
        ),
        path,
        mode="append",
    )
    DeltaLog.clear_cache()


def _file_state(snap):
    return {
        f.path: (
            dict(f.partition_values or {}),
            f.size,
            f.stats,
            f.deletion_vector,
            f.base_row_id,
            f.default_row_commit_version,
        )
        for f in snap.files
    }


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _twin(src, dst):
    shutil.copytree(src, dst)
    DeltaLog.clear_cache()


@pytest.mark.parametrize(
    "parts,v2", [(None, False), (3, False), (None, True), (2, True)]
)
def test_light_checkpoint_replay_equals_classic(
    spark, tmp_path, monkeypatch, parts, v2
):
    """Twin tables, classic vs light checkpoint writer: replays of both
    checkpoints must be field-identical (and identical to the
    pre-checkpoint snapshot)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _mk_table(spark, a)
    _twin(a, b)
    before = _file_state(DeltaLog(a).snapshot())
    v_classic = write_checkpoint(a, parts=parts, v2=v2)

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(b).light_planning_engaged()
    v_light = write_checkpoint(b, parts=parts, v2=v2, spark=spark)
    assert v_light == v_classic
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()

    sa, sb = DeltaLog(a).snapshot(), DeltaLog(b).snapshot()
    assert sa.version == sb.version == v_light
    assert _file_state(sa) == _file_state(sb)
    # the light replay also matches the PRE-checkpoint state (nothing
    # invented, nothing dropped)
    assert {p for p in _file_state(sb)} == {p for p in before}
    assert _rows(DeltaTable(spark, a).to_df()) == _rows(
        DeltaTable(spark, b).to_df()
    )


def test_light_checkpoint_mapped_dv_rowtracking(spark, tmp_path, monkeypatch):
    """The hard fields: column-mapped physical partition keys + stats,
    DV descriptors, row-tracking baseRowId/defaultRowCommitVersion — all
    must survive the executor-side writer byte-for-byte."""
    a = str(tmp_path / "ma")
    b = str(tmp_path / "mb")
    _mk_table(spark, a, mapped=True, dv=True, rowtrack=True)
    _twin(a, b)
    write_checkpoint(a, v2=True)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    write_checkpoint(b, v2=True, spark=spark)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    sa, sb = DeltaLog(a).snapshot(), DeltaLog(b).snapshot()
    assert _file_state(sa) == _file_state(sb)
    assert any(f.deletion_vector for f in sb.files)
    assert any(f.base_row_id is not None for f in sb.files)
    assert _rows(DeltaTable(spark, a).to_df()) == _rows(
        DeltaTable(spark, b).to_df()
    )


def test_light_checkpoint_physical_keys_on_disk(spark, tmp_path, monkeypatch):
    """The checkpoint parquet itself must store PHYSICAL partition keys
    and percent-encoded paths (spec: external readers key off physical) —
    checked on the raw file, not through our own replayer."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "phys")
    _mk_table(spark, path, mapped=True)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    v = write_checkpoint(path, spark=spark)
    log_dir = os.path.join(path, "_delta_log")
    cp = pq.read_table(os.path.join(log_dir, f"{v:020d}.checkpoint.parquet"))
    adds = [a for a in cp.column("add").to_pylist() if a is not None]
    assert adds
    snap = DeltaLog(path).snapshot()
    phys = {
        (f.metadata or {}).get("delta.columnMapping.physicalName", f.name)
        for f in snap.schema.fields
    }
    for a in adds:
        for k in dict(a["partitionValues"]):
            assert k in phys
        stats = json.loads(a["stats"])
        for k in stats["minValues"]:
            assert k in phys


def test_light_checkpoint_part_files_and_last_checkpoint(
    spark, tmp_path, monkeypatch
):
    """Multi-part layout: every named part exists (empty ones included),
    _last_checkpoint records parts + the true action count."""
    path = str(tmp_path / "parts")
    _mk_table(spark, path)
    n_live = DeltaLog(path).snapshot().num_files
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    v = write_checkpoint(path, parts=4, spark=spark)
    log_dir = os.path.join(path, "_delta_log")
    for i in range(4):
        assert os.path.exists(
            os.path.join(
                log_dir, f"{v:020d}.checkpoint.{i + 1:010d}.{4:010d}.parquet"
            )
        )
    last = json.loads(
        open(os.path.join(log_dir, "_last_checkpoint")).read()
    )
    assert last["parts"] == 4
    assert last["version"] == v
    # size = header rows (protocol + metaData here) + live adds
    assert last["size"] == 2 + n_live
    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot().num_files == n_live


def test_light_checkpoint_auto_part_sizing(spark, tmp_path, monkeypatch):
    """parts=None sizes the parts from the previous checkpoint's action
    count / ADLS_CHECKPOINT_PART_ROWS — no counting job, no driver list."""
    path = str(tmp_path / "auto")
    _mk_table(spark, path)
    prev = json.loads(
        open(os.path.join(path, "_delta_log", "_last_checkpoint")).read()
    )
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    per_part = max(1, int(prev["size"]) // 3)
    monkeypatch.setenv("ADLS_CHECKPOINT_PART_ROWS", str(per_part))
    v = write_checkpoint(path, spark=spark)
    log_dir = os.path.join(path, "_delta_log")
    multi = [
        f
        for f in os.listdir(log_dir)
        if f.startswith(f"{v:020d}.checkpoint.0")
    ]
    assert len(multi) >= 3  # auto-sized into multiple parts
    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot().version == v


def test_light_checkpoint_via_active_session(spark, tmp_path, monkeypatch):
    """write_checkpoint with NO spark argument picks up the active session
    — auto-checkpoints (delta.checkpointInterval) and maintenance CALLs
    get the distributed path without threading."""
    path = str(tmp_path / "active")
    _mk_table(spark, path)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setenv("ADLS_CHECKPOINT_PART_ROWS", "10")
    v = write_checkpoint(path)  # no spark kwarg
    log_dir = os.path.join(path, "_delta_log")
    # multi-part output proves the light writer ran (classic parts=None
    # writes a single file)
    multi = [
        f
        for f in os.listdir(log_dir)
        if f.startswith(f"{v:020d}.checkpoint.0")
    ]
    assert len(multi) > 1
    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot().version == v


def test_light_v2_protocol_upgrade_via_light_header(
    spark, tmp_path, monkeypatch
):
    """A v2 light checkpoint on a table without the v2Checkpoint feature
    commits the protocol upgrade through the HEADER-ONLY light snapshot
    (no classic replay), then checkpoints at the upgrade version."""
    path = str(tmp_path / "v2up")
    _mk_table(spark, path)
    v_before = DeltaLog(path).latest_version()
    n_live = DeltaLog(path).snapshot().num_files
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    v = write_checkpoint(path, v2=True, spark=spark)
    assert v == v_before + 1  # the upgrade commit
    DeltaLog.clear_cache()
    snap = DeltaLog(path).snapshot()
    assert "v2Checkpoint" in (snap.protocol.get("readerFeatures") or [])
    assert snap.version == v
    assert snap.num_files == n_live


def test_rewritten_checkpoint_part_groups_never_mix(spark, tmp_path):
    """A checkpoint re-written at the SAME version with a different part
    count leaves both layouts on disk; the replayer must pick ONE complete
    group, never a mix (a naive name sort replays duplicate adds), and
    must skip torn groups entirely."""
    path = str(tmp_path / "mix")
    _mk_table(spark, path)
    n_live = DeltaLog(path).snapshot().num_files
    v = write_checkpoint(path, parts=2)
    v3 = write_checkpoint(path, parts=3)
    assert v == v3
    log_dir = os.path.join(path, "_delta_log")
    both = [
        f for f in os.listdir(log_dir) if f.startswith(f"{v:020d}.checkpoint.0")
    ]
    assert len(both) == 5  # 2-group and 3-group coexist
    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot().num_files == n_live  # no duplicates
    # tear the 3-group: replay falls back to the complete 2-group
    os.remove(
        os.path.join(log_dir, f"{v:020d}.checkpoint.{1:010d}.{3:010d}.parquet")
    )
    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot().num_files == n_live


def test_light_checkpoint_then_cleanup_log(spark, tmp_path, monkeypatch):
    """cleanup_log after a light checkpoint: replay survives on the
    checkpoint alone (the JSON history below it is gone)."""
    from athena_delta_lake_spark.delta.writer import cleanup_log

    path = str(tmp_path / "clean")
    _mk_table(spark, path)
    want = _rows(DeltaTable(spark, path).to_df())
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    write_checkpoint(path, parts=2, spark=spark)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    cleanup_log(path, retention_hours=0)
    DeltaLog.clear_cache()
    assert _rows(DeltaTable(spark, path).to_df()) == want


@pytest.mark.parametrize(
    "parts,v2", [(None, False), (3, False), (None, True), (2, True)]
)
def test_staged_remote_checkpoint_replay_equals_classic(
    spark, tmp_path, monkeypatch, parts, v2
):
    """REMOTE-scheme staging path (round-9 review): when executors cannot
    construct the fs facade (no py4j gateway in a Python worker), the
    light checkpoint routes the same action rows through Spark's NATIVE
    parquet writer into `_delta_log/.tmp/` and the driver renames the
    staged parts into place. Forced via an executor_fs_safe stub; replay
    must be field-identical to the classic writer's checkpoint."""
    from athena_delta_lake_spark.delta import fs as fsmod

    a, b = str(tmp_path / "sa"), str(tmp_path / "sb")
    _mk_table(spark, a)
    _twin(a, b)
    v_classic = write_checkpoint(a, parts=parts, v2=v2)

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setattr(fsmod, "executor_fs_safe", lambda p: False)
    v_light = write_checkpoint(b, parts=parts, v2=v2, spark=spark)
    assert v_light == v_classic
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()

    sa, sb = DeltaLog(a).snapshot(), DeltaLog(b).snapshot()
    assert sa.version == sb.version == v_light
    assert _file_state(sa) == _file_state(sb)
    assert _rows(DeltaTable(spark, a).to_df()) == _rows(
        DeltaTable(spark, b).to_df()
    )
    # the staging scratch dir is cleaned up
    tmp_dir = os.path.join(b, "_delta_log", ".tmp")
    assert not os.path.exists(tmp_dir) or not os.listdir(tmp_dir)
    # _last_checkpoint size/parts reflect what actually landed
    last = json.loads(
        open(os.path.join(b, "_delta_log", "_last_checkpoint")).read()
    )
    assert last["version"] == v_light
    names = os.listdir(os.path.join(b, "_delta_log"))
    if not v2 and last.get("parts"):
        got = [
            n
            for n in names
            if n.startswith(f"{v_light:020d}.checkpoint.")
            and n.endswith(".parquet")
        ]
        assert len(got) == last["parts"]


def test_staged_remote_checkpoint_mapped_dv_rowtracking(
    spark, tmp_path, monkeypatch
):
    """Hard fields through the staged writer: column-mapped physical
    partition keys + stats, DV descriptors, row-tracking columns."""
    from athena_delta_lake_spark.delta import fs as fsmod

    a, b = str(tmp_path / "sma"), str(tmp_path / "smb")
    _mk_table(spark, a, mapped=True, dv=True, rowtrack=True)
    _twin(a, b)
    write_checkpoint(a, v2=True)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setattr(fsmod, "executor_fs_safe", lambda p: False)
    write_checkpoint(b, v2=True, spark=spark)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    sa, sb = DeltaLog(a).snapshot(), DeltaLog(b).snapshot()
    assert _file_state(sa) == _file_state(sb)
    assert any(f.deletion_vector for f in sb.files)
    assert any(f.base_row_id is not None for f in sb.files)
    assert _rows(DeltaTable(spark, a).to_df()) == _rows(
        DeltaTable(spark, b).to_df()
    )
