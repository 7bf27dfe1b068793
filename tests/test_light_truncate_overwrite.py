"""Driver-light full-table rewrites (round-10 ask #3).

TRUNCATE, plain INSERT OVERWRITE (write_delta mode='overwrite'), and the
deltapond sink's overwrite each listed every live file driver-side to
build their remove actions — plus the classic snapshot that produced the
list (8.6 GiB at 10^7 adds). Past the light-planning threshold all three
now stream the removes from LightSnapshot.files_df executor-side through
writer.commit_streamed_removes, with a strict version-watermark OCC.
These tests force the threshold low, POISON DeltaLog.snapshot, and
assert result-equality with the classic path plus the raced-commit
refusal."""

import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.dml import truncate_table
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import (
    ConcurrentWriteError,
    write_checkpoint,
)


def _mk(spark, path, n=60, config=None):
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(n)],
        "id long, part int, v double",
    )
    write_delta(df, path, partition_by=["part"], configuration=config)
    write_checkpoint(path)
    DeltaLog.clear_cache()


def _poison(monkeypatch):
    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append((self.table_path, version))
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    return calls, orig


def _commit_actions(path, v):
    import json

    out = []
    with open(os.path.join(path, "_delta_log", f"{v:020d}.json")) as f:
        for line in f:
            out.append(json.loads(line))
    return out


def test_truncate_stays_light_and_equals_classic(spark, tmp_path, monkeypatch):
    classic = str(tmp_path / "trunc_classic")
    light = str(tmp_path / "trunc_light")
    _mk(spark, classic)
    _mk(spark, light)
    res_c = truncate_table(classic)

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls, _ = _poison(monkeypatch)
    res_l = truncate_table(light)
    assert calls == [], f"classic snapshot replayed: {calls}"
    assert res_l == res_c and res_l["files_removed"] > 0
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    assert DeltaTable(spark, light).to_df().count() == 0
    # same action shape: a remove-only commit dropping EXACTLY the v0
    # live set, every remove dataChange=true
    acts_l = _commit_actions(light, 1)
    rm_l = sorted(a["remove"]["path"] for a in acts_l if "remove" in a)
    live_v0 = sorted(f.path for f in DeltaLog(light).snapshot(0).files)
    assert rm_l == live_v0
    assert all(
        a["remove"]["dataChange"] for a in acts_l if "remove" in a
    )
    assert not any("add" in a for a in acts_l)
    # schema/properties survive; the table accepts new writes
    write_delta(
        spark.createDataFrame([(999, 0, 9.9)], "id long, part int, v double"),
        light,
        mode="append",
    )
    assert DeltaTable(spark, light).to_df().count() == 1


def test_truncate_light_empty_table_noop(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "trunc_empty")
    _mk(spark, path)
    truncate_table(path)  # classic truncate empties it
    write_checkpoint(path)
    DeltaLog.clear_cache()
    v_before = DeltaLog(path).latest_version()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls, _ = _poison(monkeypatch)
    assert truncate_table(path) == {"files_removed": 0}
    assert calls == []
    # no empty commit appended
    assert DeltaLog(path).latest_version() == v_before


def test_truncate_light_respects_append_only(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "trunc_ao")
    _mk(spark, path, config={"delta.appendOnly": "true"})
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    with pytest.raises(ValueError, match="appendOnly"):
        truncate_table(path)


def test_overwrite_stays_light_and_equals_classic(
    spark, tmp_path, monkeypatch
):
    classic = str(tmp_path / "ow_classic")
    light = str(tmp_path / "ow_light")
    _mk(spark, classic)
    _mk(spark, light)
    new = spark.createDataFrame(
        [(1000 + i, i % 3, -float(i)) for i in range(9)],
        "id long, part int, v double",
    )
    write_delta(new, classic, mode="overwrite")

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls, _ = _poison(monkeypatch)
    v = write_delta(new, light, mode="overwrite")
    assert calls == [], f"classic snapshot replayed: {calls}"
    assert v == 1
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()

    rows_c = sorted(tuple(r) for r in DeltaTable(spark, classic).to_df().collect())
    rows_l = sorted(tuple(r) for r in DeltaTable(spark, light).to_df().collect())
    assert rows_l == rows_c and len(rows_l) == 9
    rm_l = sorted(
        a["remove"]["path"]
        for a in _commit_actions(light, 1)
        if "remove" in a
    )
    live_v0 = sorted(f.path for f in DeltaLog(light).snapshot(0).files)
    assert rm_l == live_v0 and len(rm_l) > 0
    # time travel to the pre-overwrite version still works
    assert DeltaTable(spark, light).to_df(version=0).count() == 60


def test_overwrite_light_raced_commit_replans(spark, tmp_path, monkeypatch):
    """An interleaved commit between the light overwrite's planning
    snapshot and its commit must raise ConcurrentWriteError (strict
    watermark), never silently drop the racer's files from the remove
    list."""
    from athena_delta_lake_spark.delta import writer as W

    path = str(tmp_path / "ow_race")
    _mk(spark, path)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")

    real = W.commit_streamed_removes
    raced = []

    def race_then_commit(spark_, table_path, operation, header, light, **kw):
        if not raced:
            raced.append(True)
            write_delta(
                spark.createDataFrame(
                    [(7777, 0, 7.0)], "id long, part int, v double"
                ),
                path,
                mode="append",
            )
        return real(spark_, table_path, operation, header, light, **kw)

    monkeypatch.setattr(W, "commit_streamed_removes", race_then_commit)
    new = spark.createDataFrame([(1, 0, 1.0)], "id long, part int, v double")
    with pytest.raises(ConcurrentWriteError):
        write_delta(new, path, mode="overwrite")
    monkeypatch.setattr(W, "commit_streamed_removes", real)
    # the racer's append survived; the overwrite never landed
    DeltaLog.clear_cache()
    assert DeltaTable(spark, path).to_df().count() == 61


def test_sink_overwrite_stays_light(spark, tmp_path, monkeypatch):
    from athena_delta_lake_spark.sources.deltapond_source import register

    register(spark)
    classic = str(tmp_path / "sink_classic")
    light = str(tmp_path / "sink_light")
    _mk(spark, classic)
    _mk(spark, light)
    new = spark.createDataFrame(
        [(5000 + i, i % 3, 0.5 * i) for i in range(6)],
        "id long, part int, v double",
    )
    (
        new.write.format("deltapond")
        .mode("overwrite")
        .option("path", classic)
        .option("partitionBy", "part")
        .save()
    )
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls, _ = _poison(monkeypatch)
    (
        new.write.format("deltapond")
        .mode("overwrite")
        .option("path", light)
        .option("partitionBy", "part")
        .save()
    )
    assert calls == [], f"classic snapshot replayed: {calls}"
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    rows_c = sorted(tuple(r) for r in DeltaTable(spark, classic).to_df().collect())
    rows_l = sorted(tuple(r) for r in DeltaTable(spark, light).to_df().collect())
    assert rows_l == rows_c and len(rows_l) == 6


def test_enable_row_tracking_stays_light(spark, tmp_path, monkeypatch):
    """Past the threshold the backfill's id assignment runs executor-side
    (distributed prefix sum over files_df) with DeltaLog.snapshot
    poisoned; the contract — every row reads a distinct stable _row_id
    exactly covering [0, total_rows) and the recorded high-water mark
    matches — holds identically to the classic loop."""
    from athena_delta_lake_spark.delta.reader import read_snapshot
    from athena_delta_lake_spark.delta.writer import enable_row_tracking

    path = str(tmp_path / "rt_light")
    _mk(spark, path, n=70)
    write_delta(
        spark.createDataFrame(
            [(100 + i, i % 3, 0.1) for i in range(5)],
            "id long, part int, v double",
        ),
        path,
        mode="append",
    )
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls, _ = _poison(monkeypatch)
    v = enable_row_tracking(path)
    assert calls == [], f"classic snapshot replayed: {calls}"
    assert v == DeltaLog(path).latest_version()
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()

    snap = DeltaLog(path).snapshot()
    # disjoint id ranges exactly covering [0, hwm]
    import json

    dom = json.loads(
        snap.domain_metadata["delta.rowTracking"]
    )
    ranges = sorted(
        (f.base_row_id, f.base_row_id + (f.stats or {}).get("numRecords"))
        for f in snap.files
    )
    assert ranges[0][0] == 0
    for (a0, a1), (b0, _b1) in zip(ranges, ranges[1:]):
        assert a1 == b0, ranges
    assert ranges[-1][1] - 1 == dom["rowIdHighWaterMark"]
    # every row reads a distinct stable id covering the full range
    from athena_delta_lake_spark.delta.reader import read_files_with_row_ids

    df = read_files_with_row_ids(spark, snap, snap.files)
    ids = sorted(r["_row_id"] for r in df.select("_row_id").collect())
    assert ids == list(range(75))
    # the idempotent re-call is a no-op
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    assert enable_row_tracking(path) == v


def test_enable_row_tracking_light_reassigns_preexisting_ids(
    spark, tmp_path, monkeypatch
):
    """Files that already carry a baseRowId (tracking enabled, later
    disabled, then re-enabled) must be REASSIGNED like every other file —
    the classic backfill builds its add dicts without baseRowId, so
    _assign_row_ids gives all files fresh disjoint ranges; keeping old
    ids while starting new ones at 0 would overlap ranges and understate
    the high-water mark (round-10 review finding)."""
    import json

    from athena_delta_lake_spark.delta.writer import (
        enable_row_tracking,
        unset_table_properties,
        write_checkpoint,
    )

    path = str(tmp_path / "rt_reenable")
    _mk(spark, path, n=50)
    enable_row_tracking(path)  # classic: files now carry baseRowIds
    unset_table_properties(path, ["delta.enableRowTracking"])
    # new files WITHOUT ids, alongside old files WITH ids
    write_delta(
        spark.createDataFrame(
            [(200 + i, i % 3, 2.0) for i in range(10)],
            "id long, part int, v double",
        ),
        path,
        mode="append",
    )
    write_checkpoint(path)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls, _ = _poison(monkeypatch)
    v = enable_row_tracking(path)
    assert calls == []
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    snap = DeltaLog(path).snapshot()
    dom = json.loads(snap.domain_metadata["delta.rowTracking"])
    ranges = sorted(
        (f.base_row_id, f.base_row_id + (f.stats or {}).get("numRecords"))
        for f in snap.files
    )
    # fresh ranges start ABOVE the prior enablement's high-water mark:
    # files rewritten under the old enablement may carry MATERIALIZED old
    # ids (<= old hwm) that win over baseRowId via coalesce, so ranges
    # restarting at 0 would duplicate ids table-wide (round-10 review)
    assert ranges[0][0] == 50  # old hwm was 49 (50 rows at first enable)
    for (a0, a1), (b0, _b1) in zip(ranges, ranges[1:]):
        assert a1 == b0, ranges  # disjoint AND covering
    assert ranges[-1][1] - 1 == dom["rowIdHighWaterMark"]
    assert ranges[-1][1] == 50 + 60  # every row counted once, past old hwm


def test_drop_feature_stays_light(spark, tmp_path, monkeypatch):
    """DROP FEATURE past the threshold: every check is header-only except
    the deletionVectors live-DV count, which runs executor-side over
    files_df — with DeltaLog.snapshot poisoned, a DV-carrying table must
    still be refused and a purged one must drop cleanly."""
    import pytest as _pytest

    from athena_delta_lake_spark.delta.dml import reorg_purge
    from athena_delta_lake_spark.delta.features import drop_feature

    path = str(tmp_path / "dropf_light")
    _mk(spark, path, n=40)
    DeltaTable(spark, path).delete(where="id % 5 = 0", mode="mor")  # DVs
    write_checkpoint(path)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls, _ = _poison(monkeypatch)
    with _pytest.raises(ValueError, match="deletion vectors"):
        drop_feature(path, "deletionVectors")
    assert calls == [], f"classic snapshot replayed: {calls}"
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    reorg_purge(spark, path)  # rewrite DV'd files; feature now unused
    write_checkpoint(path)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls.clear()
    res = drop_feature(path, "deletionVectors")
    # the light DV count (files_df full=True scan) found zero blockers;
    # the protecting-checkpoint path may legitimately replay nothing
    # classic either
    assert calls == [], f"classic snapshot replayed: {calls}"
    assert "deletionVectors" not in set(
        res["protocol"].get("readerFeatures") or []
    )
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    # the table still reads correctly post-drop
    assert DeltaTable(spark, path).to_df().count() == 32
