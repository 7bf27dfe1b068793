"""ALTER TABLE ... DROP FEATURE: protocol downgrade + trace rules.

Mirrors delta-spark's removable-features contract (see
delta/features.py): current-snapshot traces block, controlling
properties are stripped by the drop commit, reader+writer features with
historical traces demand TRUNCATE HISTORY."""

import json
import os

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.catalog import DeltaPond
from athena_delta_lake_spark.delta import DeltaLog, drop_feature
from athena_delta_lake_spark.delta.dml import delete_mor, reorg_purge
from athena_delta_lake_spark.delta.writer import (
    add_check_constraint,
    drop_check_constraint,
    enable_column_mapping,
    enable_row_tracking,
    rename_column,
    write_checkpoint,
)


def _features(path):
    p = DeltaLog(path).snapshot().protocol
    return (
        set(p.get("readerFeatures") or []),
        set(p.get("writerFeatures") or []),
        p,
    )


def _write(spark, path, n=50, **kw):
    write_delta(spark.range(n).selectExpr("id", "id % 5 as k"), path, **kw)


# ------------------------------------------------------- writer-only drops


def test_drop_change_data_feed_immediate(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path, configuration={"delta.enableChangeDataFeed": "true"})
    write_delta(
        spark.range(50, 60).selectExpr("id", "id % 5 as k"), path, mode="append"
    )
    res = drop_feature(path, "changeDataFeed")
    r, w, proto = _features(path)
    assert "changeDataFeed" not in r | w
    snap = DeltaLog(path).snapshot()
    cfg = snap.metadata.get("configuration") or {}
    assert "delta.enableChangeDataFeed" not in cfg  # property stripped
    # history intact (writer-only feature: readers never needed it)
    assert os.path.exists(
        os.path.join(path, "_delta_log", f"{0:020d}.json")
    )
    # table still writable and readable afterwards
    write_delta(
        spark.range(60, 70).selectExpr("id", "id % 5 as k"), path, mode="append"
    )
    assert DeltaTable(spark, path).to_df().count() == 70
    assert res["version"] == snap.version


def test_drop_normalizes_back_to_legacy_protocol(spark, tmp_path):
    """(1,4)-equivalent explicit features minus generatedColumns+CDF ==
    legacy 2's implied set -> protocol rewrites as the legacy pair."""
    path = str(tmp_path / "t")
    _write(spark, path)
    from athena_delta_lake_spark.delta.writer import (
        _commit_metadata_change,
    )

    snap = DeltaLog(path).snapshot()
    _commit_metadata_change(
        path,
        "UPGRADE",
        {},
        dict(snap.metadata),
        snap.version + 1,
        extra_actions=[
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": [
                        "appendOnly",
                        "invariants",
                        "changeDataFeed",
                    ],
                }
            }
        ],
    )
    drop_feature(path, "changeDataFeed")
    _, _, proto = _features(path)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}


def test_drop_row_tracking_removes_domain(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    enable_row_tracking(path)
    write_delta(
        spark.range(50, 80).selectExpr("id", "id % 5 as k"), path, mode="append"
    )
    assert "delta.rowTracking" in DeltaLog(path).snapshot().domain_metadata
    drop_feature(path, "rowTracking")
    snap = DeltaLog(path).snapshot()
    assert "delta.rowTracking" not in snap.domain_metadata
    assert "delta.enableRowTracking" not in (
        snap.metadata.get("configuration") or {}
    )
    _, w, _ = _features(path)
    assert "rowTracking" not in w
    assert DeltaTable(spark, path).to_df().count() == 80


# ------------------------------------------------- blocked by live traces


def test_drop_check_constraints_blocked_then_ok(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    add_check_constraint(spark, path, "pos", "id >= 0")
    with pytest.raises(ValueError, match="DROP CONSTRAINT"):
        drop_feature(path, "checkConstraints")
    drop_check_constraint(path, "pos")
    drop_feature(path, "checkConstraints")
    _, w, _ = _features(path)
    assert "checkConstraints" not in w


def test_drop_deletion_vectors_blocked_by_live_dvs(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    delete_mor(spark, path, "id % 10 = 0")
    with pytest.raises(ValueError, match="REORG"):
        drop_feature(path, "deletionVectors", truncate_history=True)


def test_drop_missing_feature_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    with pytest.raises(ValueError, match="not on"):
        drop_feature(path, "deletionVectors")


# --------------------------------------- reader+writer: history semantics


def test_drop_deletion_vectors_protected_without_truncate(spark, tmp_path):
    """Round-7: dropping a traced reader feature WITHOUT TRUNCATE HISTORY
    takes the Delta 4.0 checkpointProtection path — history survives,
    time travel works on both sides of the boundary."""
    path = str(tmp_path / "t")
    _write(spark, path)
    delete_mor(spark, path, "id % 10 = 0")
    reorg_purge(spark, path)  # snapshot now DV-free
    pre_drop = DeltaTable(spark, path).version()
    pre_counts = {
        v: DeltaTable(spark, path).to_df(version=v).count()
        for v in range(pre_drop + 1)
    }
    res = drop_feature(path, "deletionVectors")
    assert res["checkpoint_protection"] == pre_drop + 1
    assert res["truncated"] == []
    r, w, _ = _features(path)
    assert "deletionVectors" not in r | w
    assert "checkpointProtection" in w
    snap = DeltaLog(path).snapshot()
    cfg = snap.metadata.get("configuration") or {}
    assert cfg["delta.requireCheckpointProtectionBeforeVersion"] == str(
        pre_drop + 1
    )
    # the protecting checkpoint exists at the drop version
    log_dir = os.path.join(path, "_delta_log")
    assert os.path.exists(
        os.path.join(log_dir, f"{pre_drop + 1:020d}.checkpoint.parquet")
    )
    # history intact: every pre-drop version still time-travels (the
    # per-version protocol still declares deletionVectors there)
    for v, n in pre_counts.items():
        assert DeltaTable(spark, path).to_df(version=v).count() == n
    # checkpointProtection itself only drops with TRUNCATE HISTORY
    with pytest.raises(ValueError, match="TRUNCATE HISTORY"):
        drop_feature(path, "checkpointProtection")
    res2 = drop_feature(path, "checkpointProtection", truncate_history=True)
    assert res2["truncated"]
    r2, w2, _ = _features(path)
    assert "checkpointProtection" not in w2
    cfg2 = DeltaLog(path).snapshot().metadata.get("configuration") or {}
    assert "delta.requireCheckpointProtectionBeforeVersion" not in cfg2


def test_drop_deletion_vectors_truncate_history(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    delete_mor(spark, path, "id % 10 = 0")
    write_checkpoint(path)  # old checkpoint carries DV descriptors
    reorg_purge(spark, path)
    expected = sorted(
        r["id"] for r in DeltaTable(spark, path).to_df().collect()
    )
    res = drop_feature(path, "deletionVectors", truncate_history=True)
    assert res["truncated"]  # old log entries deleted
    r, w, _ = _features(path)
    assert "deletionVectors" not in r | w
    snap = DeltaLog(path).snapshot()
    assert snap.version == res["version"]
    # content stable across the downgrade
    got = sorted(r["id"] for r in DeltaTable(spark, path).to_df().collect())
    assert got == expected
    log_dir = os.path.join(path, "_delta_log")
    names = os.listdir(log_dir)
    # only the drop commit's json + its checkpoint remain
    assert [n for n in names if n.endswith(".json") and "." not in n[:-5]] == [
        f"{res['version']:020d}.json"
    ]
    assert f"{res['version']:020d}.checkpoint.parquet" in names
    # no retained entry mentions a deletion vector
    for n in names:
        if n.endswith(".json"):
            with open(os.path.join(log_dir, n)) as fh:
                assert '"deletionVector"' not in fh.read()
    # time travel to pre-truncation versions is gone
    with pytest.raises(Exception):
        DeltaLog(path).snapshot(0)
    # still writable; a fresh DV cycle can re-add the feature
    delete_mor(spark, path, "id = 7")
    r2, _, _ = _features(path)
    assert "deletionVectors" in r2


def test_drop_column_mapping_clean_layout(spark, tmp_path):
    """Mapping enabled but never renamed: physical == logical everywhere,
    so the feature drops (with history truncation) and the bare schema
    reads identically."""
    path = str(tmp_path / "t")
    _write(spark, path)
    enable_column_mapping(path)
    write_delta(
        spark.range(50, 60).selectExpr("id", "id % 5 as k"), path, mode="append"
    )
    drop_feature(path, "columnMapping", truncate_history=True)
    snap = DeltaLog(path).snapshot()
    cfg = snap.metadata.get("configuration") or {}
    assert not any(k.startswith("delta.columnMapping") for k in cfg)
    assert "delta.columnMapping.physicalName" not in (
        snap.metadata.get("schemaString") or ""
    )
    r, w, _ = _features(path)
    assert "columnMapping" not in r | w
    assert DeltaTable(spark, path).to_df().count() == 60


def test_drop_column_mapping_refused_after_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    enable_column_mapping(path)
    rename_column(path, "k", "bucket")
    with pytest.raises(ValueError, match="physical names diverge"):
        drop_feature(path, "columnMapping", truncate_history=True)


def test_drop_v2_checkpoint_truncates_manifests(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    snap = DeltaLog(path).snapshot()
    from athena_delta_lake_spark.delta.writer import _commit_metadata_change

    _commit_metadata_change(
        path,
        "UPGRADE",
        {},
        dict(snap.metadata),
        snap.version + 1,
        extra_actions=[
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["v2Checkpoint"],
                    "writerFeatures": ["v2Checkpoint"],
                }
            }
        ],
    )
    write_checkpoint(path, v2=True)
    drop_feature(path, "v2Checkpoint", truncate_history=True)
    log_dir = os.path.join(path, "_delta_log")
    assert not os.path.isdir(os.path.join(log_dir, "_sidecars"))
    import re

    for n in os.listdir(log_dir):
        if ".checkpoint." in n and n.endswith(".parquet"):
            assert re.match(
                r"^\d{20}\.checkpoint(\.\d{10}\.\d{10})?\.parquet$", n
            ), n  # only classic shapes remain
    r, w, _ = _features(path)
    assert "v2Checkpoint" not in r | w
    assert DeltaTable(spark, path).to_df().count() == 50


def test_drop_domain_metadata_blocked_by_dependents(spark, tmp_path):
    path = str(tmp_path / "t")
    _write(spark, path)
    enable_row_tracking(path)
    with pytest.raises(ValueError, match="depend on domainMetadata"):
        drop_feature(path, "domainMetadata")


# ------------------------------------------------------------- SQL route


def test_sql_drop_feature_route(spark, tmp_path):
    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(40).selectExpr("id", "id % 4 as k"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    pond = DeltaPond(spark, root)
    row = pond.sql("ALTER TABLE lake.t DROP FEATURE changeDataFeed").first()
    assert row["operation"] == "drop_feature"
    assert row["feature"] == "changeDataFeed"
    proto = json.loads(row["protocol"])
    assert "changeDataFeed" not in (proto.get("writerFeatures") or [])
    _, w, _ = _features(path)
    assert "changeDataFeed" not in w


def test_sql_drop_feature_truncate_history(spark, tmp_path):
    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(spark.range(40).selectExpr("id", "id % 4 as k"), path)
    delete_mor(spark, path, "id % 8 = 0")
    pond = DeltaPond(spark, root)
    pond.sql("REORG TABLE lake.t APPLY (PURGE)")
    row = pond.sql(
        "ALTER TABLE lake.t DROP FEATURE deletionVectors TRUNCATE HISTORY"
    ).first()
    assert int(row["truncated_entries"]) > 0
    r, w, _ = _features(path)
    assert "deletionVectors" not in r | w
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 35


def test_describe_detail_table_features(spark, tmp_path):
    """DESCRIBE DETAIL exposes delta-spark's tableFeatures column with
    legacy implications enumerated: a (1,4) CDF table shows changeDataFeed
    even though the protocol has no explicit feature list."""
    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(10).selectExpr("id"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    assert "changeDataFeed" in DeltaTable(spark, path).detail()["tableFeatures"]
    pond = DeltaPond(spark, root)
    row = pond.sql("DESCRIBE DETAIL lake.t").first()
    assert "changeDataFeed" in row["tableFeatures"]


def test_vacuum_reaps_orphaned_dv_blobs_after_truncate(spark, tmp_path):
    """After REORG + DROP FEATURE deletionVectors TRUNCATE HISTORY the DV
    blobs have no retained remove action pointing at them — VACUUM must
    still reap them as untracked files."""
    import glob

    from athena_delta_lake_spark.delta.dml import vacuum

    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(spark.range(100).selectExpr("id", "id % 4 AS k"), path)
    delete_mor(spark, path, "id % 10 = 0")
    pond = DeltaPond(spark, root)
    pond.sql("REORG TABLE lake.t APPLY (PURGE)")
    pond.sql("ALTER TABLE lake.t DROP FEATURE deletionVectors TRUNCATE HISTORY")
    assert glob.glob(f"{path}/deletion_vector*.bin") or glob.glob(
        f"{path}/**/*.bin", recursive=True
    )
    vacuum(path, retention_hours=0.0)
    assert not glob.glob(f"{path}/**/*.bin", recursive=True)
    assert DeltaTable(spark, path).to_df().count() == 90


def test_drop_timestamp_ntz_sees_escaped_history_traces(spark, tmp_path):
    """Schema traces live inside metaData.schemaString, an ESCAPED JSON
    string in the commit file — the history scan must match the escaped
    form, or a reader+writer feature drops while retained history still
    needs it (regression: markers with plain quotes never matched)."""
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(5).selectExpr(
            "id", "CAST(timestamp'2024-01-01 00:00:00' AS TIMESTAMP_NTZ) AS ts"
        ),
        path,
    )
    r, w, _ = _features(path)
    assert "timestampNtz" in r
    # REPLACE swaps to a schema without the NTZ column: the CURRENT
    # snapshot is trace-free, but v0's schemaString still carries it
    pond.sql("CREATE OR REPLACE TABLE lake.t AS SELECT id FROM range(3)")
    # without TRUNCATE HISTORY the escaped trace forces the protected
    # path (checkpointProtection), proving the scan matched
    probe = drop_feature(path, "timestampNtz")
    assert probe["checkpoint_protection"] is not None
    drop_feature(path, "checkpointProtection", truncate_history=True)
    r2, w2, _ = _features(path)
    assert "timestampNtz" not in r2 | w2
    assert DeltaTable(spark, path).to_df().count() == 3


def test_drop_column_mapping_detects_physical_name_history(spark, tmp_path):
    """A mapped schemaString (escaped physicalName stamps) in retained
    history forces TRUNCATE HISTORY even if the mode hit alone were
    missed; covers id-mode-like histories where the mode string differs."""
    path = str(tmp_path / "t")
    _write(spark, path)
    enable_column_mapping(path)
    write_delta(
        spark.range(50, 55).selectExpr("id", "id % 5 AS k"), path, mode="append"
    )
    res = drop_feature(path, "columnMapping")
    # the escaped physicalName stamps in history were detected: the drop
    # went through the protected path instead of a plain downgrade
    assert res["checkpoint_protection"] is not None


def test_restore_redeclares_features_reinstated_by_metadata(spark, tmp_path):
    """RESTORE to a version whose metaData re-enables a feature the
    protocol has since dropped must re-declare the feature in the restore
    commit — otherwise later writers maintain CDF/DV/mapping state the
    protocol never announced (spec violation an external writer would
    miss)."""
    import glob

    from athena_delta_lake_spark.delta.dml import restore_table, update

    path = str(tmp_path / "t")
    write_delta(
        spark.range(10).selectExpr("id"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    write_delta(spark.range(10, 15).selectExpr("id"), path, mode="append")
    drop_feature(path, "changeDataFeed")
    restore_table(path, version=1)
    _, w, _ = _features(path)
    assert "changeDataFeed" in w
    update(spark, path, set={"id": "id + 100"}, where="id = 3")
    assert glob.glob(f"{path}/_change_data/*")  # CDF maintained, declared
    # a plain restore on a legacy-protocol table keeps the legacy pair
    p2 = str(tmp_path / "plain")
    write_delta(spark.range(5).selectExpr("id"), p2)
    write_delta(spark.range(5, 8).selectExpr("id"), p2, mode="append")
    restore_table(p2, version=0)
    assert DeltaLog(p2).snapshot().protocol == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }


def test_restore_reinstates_row_tracking_high_water_mark(spark, tmp_path):
    """RESTORE bringing row tracking back must also bring back the
    delta.rowTracking high-water-mark domain — otherwise the next append
    restarts baseRowId at 0 and collides with the restored files' ids."""
    from athena_delta_lake_spark.delta.dml import restore_table

    path = str(tmp_path / "t")
    _write(spark, path)
    enable_row_tracking(path)
    write_delta(
        spark.range(50, 80).selectExpr("id", "id % 5 AS k"), path, mode="append"
    )
    drop_feature(path, "rowTracking")
    restore_table(path, version=2)  # row-tracked state
    snap = DeltaLog(path).snapshot()
    assert "delta.rowTracking" in snap.domain_metadata
    write_delta(
        spark.range(80, 90).selectExpr("id", "id % 5 AS k"), path, mode="append"
    )
    t = DeltaTable(spark, path)
    ids = [r["_row_id"] for r in t.to_df_with_row_ids().collect()]
    assert len(ids) == len(set(ids)), "duplicate row ids after restore"
    assert len(ids) == 90


def test_restore_refreshes_ict_enablement(spark, tmp_path):
    """RESTORE re-enabling in-commit timestamps must refresh the
    enablement markers to the restore commit and stamp the restore commit
    itself — commits made while ICT was off carry no inCommitTimestamp."""
    import json

    from athena_delta_lake_spark.delta.dml import restore_table

    path = str(tmp_path / "t")
    write_delta(
        spark.range(10).selectExpr("id"),
        path,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    write_delta(spark.range(10, 15).selectExpr("id"), path, mode="append")
    drop_feature(path, "inCommitTimestamp")
    write_delta(spark.range(15, 18).selectExpr("id"), path, mode="append")
    res = restore_table(path, version=1)
    v = res["committed_version"]
    snap = DeltaLog(path).snapshot()
    cfg = snap.metadata["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == str(v)
    # the restore commit itself carries an inCommitTimestamp
    line = open(
        f"{path}/_delta_log/{v:020d}.json"
    ).readline()
    ci = json.loads(line)["commitInfo"]
    assert "inCommitTimestamp" in ci
    # and the timestamp resolver works across the mixed history
    assert DeltaLog(path).commit_timestamp(v) == int(ci["inCommitTimestamp"])
