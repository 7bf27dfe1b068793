"""Minor log compaction (`<start>.<end>.compacted.json`, round 5): replay
prefers a compacted range file over the per-commit JSONs when it fits, and
keeps working after those commits are deleted by third-party maintenance.
compact_log writes the spec layout; hand-built external files parse too."""

from __future__ import annotations

import json
import os

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.dml import delete
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import compact_log


def _build(spark, path):
    """v0 create, v1 append, v2 partial delete, v3 append."""
    write_delta(spark.range(10).selectExpr("id", "id % 3 AS k"), path)
    write_delta(
        spark.range(10, 20).selectExpr("id", "id % 3 AS k"), path, mode="append"
    )
    delete(spark, path, "id in (0, 15)")
    write_delta(
        spark.range(50, 55).selectExpr("id", "id % 3 AS k"), path, mode="append"
    )


def _state(spark, path, version=None):
    return sorted(
        tuple(r) for r in DeltaTable(spark, path).to_df(version=version).collect()
    )


def test_compacted_range_replays_identically(spark, tmp_path):
    path = str(tmp_path / "lc1")
    _build(spark, path)
    want = _state(spark, path)
    out = compact_log(path, 1, 3)
    assert os.path.basename(out) == f"{1:020d}.{3:020d}.compacted.json"
    DeltaLog.clear_cache()
    assert _state(spark, path) == want  # compacted preferred, same state


def test_replay_survives_deleted_commits(spark, tmp_path):
    path = str(tmp_path / "lc2")
    _build(spark, path)
    want = _state(spark, path)
    compact_log(path, 1, 3)
    for v in (1, 2, 3):  # third-party maintenance removed the commits
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    DeltaLog.clear_cache()
    assert DeltaLog(path).latest_version() == 3
    assert _state(spark, path) == want
    # v0 still replays (below the compacted range)
    assert len(_state(spark, path, version=0)) == 10
    # an intermediate version inside the missing range is gone — clean error
    with pytest.raises(ValueError):
        DeltaLog(path).snapshot(2)


def test_partial_fit_falls_back_to_commits(spark, tmp_path):
    # compacted [1,3] cannot serve snapshot(2): per-commit JSONs are used
    path = str(tmp_path / "lc3")
    _build(spark, path)
    mid = _state(spark, path, version=2)
    compact_log(path, 1, 3)
    DeltaLog.clear_cache()
    assert _state(spark, path, version=2) == mid


def test_compacted_after_checkpoint(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "lc4")
    _build(spark, path)
    write_checkpoint(path)  # checkpoint at v3
    write_delta(
        spark.range(100, 103).selectExpr("id", "id % 3 AS k"), path, mode="append"
    )  # v4
    delete(spark, path, "id = 101")  # v5
    want = _state(spark, path)
    compact_log(path, 4, 5)
    for v in (4, 5):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    DeltaLog.clear_cache()
    assert _state(spark, path) == want


def test_hand_built_third_party_compacted(spark, tmp_path):
    """External layout: a compacted file NOT produced by this engine
    (different action ordering, extra commitInfo) replays correctly."""
    path = str(tmp_path / "lc5")
    write_delta(spark.range(5).selectExpr("id"), path)  # v0
    write_delta(spark.range(5, 8).selectExpr("id"), path, mode="append")  # v1
    write_delta(spark.range(8, 9).selectExpr("id"), path, mode="append")  # v2
    # reconcile v1..v2 by hand, odd ordering + stray commitInfo
    log = DeltaLog(path)
    actions = []
    for v in (1, 2):
        actions += [a for a in log.commit_actions(v) if "add" in a]
    out = os.path.join(path, "_delta_log", f"{1:020d}.{2:020d}.compacted.json")
    with open(out, "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "COMPACTION"}}) + "\n")
        for a in reversed(actions):
            f.write(json.dumps(a) + "\n")
    for v in (1, 2):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    DeltaLog.clear_cache()
    assert len(_state(spark, path)) == 9


def test_latest_protocol_from_compacted(spark, tmp_path):
    path = str(tmp_path / "lc6")
    write_delta(spark.range(5).selectExpr("id"), path)  # v0 (has protocol)
    write_delta(spark.range(5, 8).selectExpr("id"), path, mode="append")  # v1
    compact_log(path, 0, 1)
    for v in (0, 1):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    DeltaLog.clear_cache()
    proto = DeltaLog(path).latest_protocol()
    assert proto is not None and "minWriterVersion" in proto
    # and a write still lands on top of the compacted-only log
    write_delta(spark.range(8, 10).selectExpr("id"), path, mode="append")
    assert len(_state(spark, path)) == 10


def test_bad_range_rejected(spark, tmp_path):
    path = str(tmp_path / "lc7")
    write_delta(spark.range(3).selectExpr("id"), path)
    with pytest.raises(ValueError, match="exceeds latest"):
        compact_log(path, 0, 9)
    with pytest.raises(ValueError, match="bad compaction range"):
        compact_log(path, 2, 1)


def test_call_compact_log_procedure(spark, tmp_path):
    from athena_delta_lake_spark.catalog import DeltaPond

    pond = DeltaPond(spark, str(tmp_path / "pond_lc"))
    pond.sql("CREATE SCHEMA lake")
    pond.sql("CREATE TABLE lake.c AS SELECT id FROM range(5)")
    pond.sql("INSERT INTO lake.c SELECT id + 10 FROM range(5)")
    pond.sql("INSERT INTO lake.c SELECT id + 20 FROM range(5)")
    row = pond.sql(
        "CALL compact_log('lake.c', start_version => 1, end_version => 2)"
    ).first()
    assert row["compacted"] == f"{1:020d}.{2:020d}.compacted.json"
    path = pond.table_path("lake", "c")
    for v in (1, 2):
        os.remove(os.path.join(path, "_delta_log", f"{v:020d}.json"))
    DeltaLog.clear_cache()
    assert pond.sql("SELECT count(*) AS n FROM lake.c").first()["n"] == 15
