"""Auto-routed driver-light planning (round-8 ask #3).

Past ADLS_LIGHT_PLANNING_FILES (default 10^6, read from
`_last_checkpoint`'s action count), ordinary `to_df(where=...)` and
predicate DELETE/UPDATE stop materializing the classic driver-resident
snapshot: pruning runs executor-side over the checkpoint parquet
(LightSnapshot.prune_df) and only the survivors come back as AddFiles.
These tests force the threshold low and assert the light path is
RESULT-IDENTICAL to classic on every surface it touches — scan, DELETE
(cow+mor), UPDATE, column-mapped stats remapping, DV descriptor
reconstruction, and the collect-cap fallback.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import (
    enable_column_mapping,
    rename_column,
    write_checkpoint,
)


def _mk_table(spark, path, mapped=False, dv=False):
    df = spark.createDataFrame(
        [(i, i % 8, float(i), f"s{i}") for i in range(400)],
        "id long, part int, v double, name string",
    )
    write_delta(df, path, partition_by=["part"])
    if mapped:
        enable_column_mapping(path)
        rename_column(path, "v", "val")
        rename_column(path, "val", "v")  # same logical name, mapped physical
    if dv:
        DeltaTable(spark, path).delete(where="id % 37 = 0", mode="mor")
    write_checkpoint(path)
    # a post-checkpoint tail: overlay adds + dead paths both exercised
    write_delta(
        spark.createDataFrame(
            [(1000 + i, i % 8, -1.0, "tail") for i in range(16)],
            "id long, part int, v double, name string",
        ),
        path,
        mode="append",
    )
    DeltaLog.clear_cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("mapped,dv", [(False, False), (True, True)])
def test_light_to_df_equals_classic(spark, tmp_path, monkeypatch, mapped, dv):
    path = str(tmp_path / "t")
    _mk_table(spark, path, mapped=mapped, dv=dv)
    t = DeltaTable(spark, path)
    queries = [
        ("part = 3 AND id < 200", None),
        ("v >= 100.0", ["id", "v"]),
        (None, None),
    ]
    classic = []
    for where, cols in queries:
        assert not t.log.light_planning_engaged()
        classic.append(_rows(t.to_df(where=where, columns=cols)))
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert t.log.light_planning_engaged()
    for (where, cols), want in zip(queries, classic):
        got = _rows(t.to_df(where=where, columns=cols))
        assert got == want, (where, cols)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_light_delete_equals_classic(spark, tmp_path, monkeypatch, mode):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (a, b):
        _mk_table(spark, p)
    DeltaTable(spark, a).delete(where="part = 2 AND id < 150", mode=mode)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(b).light_planning_engaged()
    res = DeltaTable(spark, b).delete(where="part = 2 AND id < 150", mode=mode)
    assert _rows(DeltaTable(spark, a).to_df()) == _rows(
        DeltaTable(spark, b).to_df()
    )
    assert res["rows_deleted"] == 19  # 150/8 ids in part 2, minus none


def test_light_partition_fastpath_delete(spark, tmp_path, monkeypatch):
    """Partition-only DELETE stays metadata-only (zero adds) on the light
    path — prune_df's partition pruning is exact there."""
    path = str(tmp_path / "fast")
    _mk_table(spark, path)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    res = DeltaTable(spark, path).delete(where="part = 5")
    assert res["files_added"] == 0
    assert DeltaTable(spark, path).to_df().filter("part = 5").count() == 0


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_light_update_equals_classic(spark, tmp_path, monkeypatch, mode):
    a, b = str(tmp_path / "ua"), str(tmp_path / "ub")
    for p in (a, b):
        _mk_table(spark, p)
    DeltaTable(spark, a).update({"v": "v + 0.5"}, where="part = 1", mode=mode)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    DeltaTable(spark, b).update({"v": "v + 0.5"}, where="part = 1", mode=mode)
    assert _rows(DeltaTable(spark, a).to_df()) == _rows(
        DeltaTable(spark, b).to_df()
    )


def test_light_collect_cap_falls_back_classic(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "cap")
    _mk_table(spark, path)
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setenv("ADLS_LIGHT_COLLECT_CAP", "1")
    t = DeltaTable(spark, path)
    # still correct — just served by the classic snapshot
    assert t.to_df(where="part = 3").count() == t.to_df().filter(
        "part = 3"
    ).count()
    res = t.delete(where="part = 3 AND id < 100")
    assert t.to_df().filter("part = 3 AND id < 100").count() == 0
    assert res["rows_deleted"] > 0


def test_light_declines_on_unsafe_predicate_type(spark, tmp_path, monkeypatch):
    """Decimal predicate columns are outside the executor-prune's exact
    domain: the light path must decline and classic planning answer."""
    path = str(tmp_path / "dec")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "id long, part int"
    ).withColumn("d", F.col("id").cast("decimal(10,2)"))
    write_delta(df, path, partition_by=["part"])
    write_checkpoint(path)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    from athena_delta_lake_spark.delta.dml import _light_planning_candidates

    assert (
        _light_planning_candidates(spark, path, [("d", "<", 50)]) is None
    )
    t = DeltaTable(spark, path)
    res = t.delete(where="d < 50")
    assert res["rows_deleted"] == 50
    assert t.to_df().count() == 50


def test_light_snapshot_state_matches_classic_addfiles(spark, tmp_path):
    """collect_pruned_add_files survivors are byte-equivalent to classic
    replay AddFiles (path, partition values, stats keys remapped to
    logical names, DV descriptor, row-tracking fields)."""
    path = str(tmp_path / "eq")
    _mk_table(spark, path, mapped=True, dv=True)
    light = DeltaLog(path).snapshot_light()
    got = {
        f.path: f
        for f in light.collect_pruned_add_files(spark, [("part", "=", 1)])
    }
    classic = DeltaLog(path).snapshot()
    from athena_delta_lake_spark.delta.stats import prune_files

    want = {f.path: f for f in prune_files(classic, [("part", "=", 1)])}
    assert set(got) == set(want)
    for p, g in got.items():
        w = want[p]
        assert g.partition_values == w.partition_values, p
        assert g.size == w.size and g.modification_time == w.modification_time
        assert (g.deletion_vector or {}) == (w.deletion_vector or {}), p
        assert g.base_row_id == w.base_row_id
        assert g.default_row_commit_version == w.default_row_commit_version
        gs, ws = g.stats, w.stats
        assert (gs or {}).get("numRecords") == (ws or {}).get("numRecords")
        for k in ("minValues", "maxValues", "nullCount"):
            assert (gs or {}).get(k) == (ws or {}).get(k), (p, k)


def test_light_count_equals_classic(spark, tmp_path, monkeypatch):
    """count() past the threshold sums numRecords - DV cardinality
    executor-side — no file list on the driver — and matches classic on
    every shape: bare, partition pred, data pred (scan route), DV'd
    files, and a stat-less foreign add (individual scan route)."""
    import json as _json
    import os as _os

    path = str(tmp_path / "cnt")
    _mk_table(spark, path, dv=True)
    t = DeltaTable(spark, path)
    shapes = [None, [("part", "=", 3)], "part = 3", "v >= 100.0",
              "part = 2 AND id < 100"]
    classic = [t.count(where=w) for w in shapes]
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert t.log.light_planning_engaged()
    for w, want in zip(shapes, classic):
        assert t.count(where=w) == want, w

    # stat-less foreign add: drop in a parquet file via hand-written
    # commit (no stats) — count must scan exactly that file
    import pyarrow as pa
    import pyarrow.parquet as pq

    fp = _os.path.join(path, "foreign.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([9001, 9002], pa.int64()),
                "v": pa.array([1.0, 2.0], pa.float64()),
                "name": pa.array(["a", "b"], pa.string()),
            }
        ),
        fp,
    )
    v = DeltaLog(path).latest_version() + 1
    with open(_os.path.join(path, "_delta_log", f"{v:020d}.json"), "w") as f:
        f.write(
            _json.dumps(
                {
                    "add": {
                        "path": "foreign.parquet",
                        "partitionValues": {"part": "7"},
                        "size": _os.path.getsize(fp),
                        "modificationTime": 1,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    DeltaLog.clear_cache()
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    want = DeltaTable(spark, path).count()
    want7 = DeltaTable(spark, path).count(where=[("part", "=", 7)])
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaTable(spark, path).count() == want
    assert DeltaTable(spark, path).count(where=[("part", "=", 7)]) == want7
    assert want7 >= 2  # includes the stat-less foreign rows


def test_light_optimize_where_equals_classic(spark, tmp_path, monkeypatch):
    """Predicate-scoped OPTIMIZE (and REORG PURGE) select candidates
    through the light path past the threshold — same visible state and
    same untouched-partition file identity as classic."""
    a, b = str(tmp_path / "oa"), str(tmp_path / "ob")
    for p in (a, b):
        _mk_table(spark, p, dv=True)
    DeltaTable(spark, a).compact(
        target_file_size=1 << 30, predicates=[("part", "=", 1)]
    )
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(b).light_planning_engaged()
    DeltaTable(spark, b).compact(
        target_file_size=1 << 30, predicates=[("part", "=", 1)]
    )
    assert _rows(DeltaTable(spark, a).to_df()) == _rows(
        DeltaTable(spark, b).to_df()
    )
    # untouched partitions keep their exact physical files on BOTH sides
    for p in (a, b):
        t = DeltaTable(spark, p)
        untouched = {
            f.path
            for f in t.snapshot().files
            if f.partition_values.get("part") != "1"
        }
        v_before = t.snapshot(t.version() - 1)
        before = {
            f.path
            for f in v_before.files
            if f.partition_values.get("part") != "1"
        }
        assert untouched == before, p
    # scoped REORG through the light path: remaining DV'd files in the
    # scope get purged
    from athena_delta_lake_spark.delta.dml import reorg_purge

    res = reorg_purge(spark, b, predicates=[("part", "=", 5)])
    snapb = DeltaTable(spark, b).snapshot()
    assert not any(
        f.deletion_vector
        for f in snapb.files
        if f.partition_values.get("part") == "5"
    )


def test_light_timestamp_time_travel(spark, tmp_path, monkeypatch):
    """pond.sql TIMESTAMP AS OF on a past-threshold table resolves the
    version from commit timestamps, then scans through _planning_snapshot
    (round-9 ask #6) — result identical to the classic path."""
    import datetime
    import time as _time

    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    path = f"{root}/lake/tt"
    _mk_table(spark, path)
    _time.sleep(1.1)  # commit-file mtime resolution
    ts = datetime.datetime.utcnow().strftime("%Y-%m-%d %H:%M:%S")
    q = f"SELECT id, v FROM lake.tt TIMESTAMP AS OF '{ts}'"
    classic = _rows(pond.sql(q))
    assert len(classic) == 416  # 400 base + 16 tail
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    DeltaLog.clear_cache()
    assert DeltaLog(path).light_planning_engaged()
    assert _rows(pond.sql(q)) == classic


def test_metadata_ddl_stays_light(spark, tmp_path, monkeypatch):
    """Metadata-only DDL (properties, comments, columns, constraints,
    domain metadata) and write_delta's append conflict-retry route
    through the header-only light state past the threshold — proven by
    poisoning DeltaLog.snapshot: none of these may replay the classic
    file list (8.6 GiB / 187 s at 10^7 adds for a one-field change)."""
    from athena_delta_lake_spark.delta import writer as W

    path = str(tmp_path / "ddl_light")
    _mk_table(spark, path)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(path).light_planning_engaged()

    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append(self.table_path)
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    W.set_table_properties(path, {"delta.appendOnly": "false"})
    W.unset_table_properties(path, ["delta.appendOnly"])
    W.set_table_comment(path, "light ddl")
    from pyspark.sql import types as T

    W.add_columns(path, [T.StructField("extra", T.StringType())])
    # the validation scan is light-planned but REAL: the tail rows hold
    # v = -1.0, so a violated constraint must still raise (an empty
    # header-fed scan would have silently accepted it)
    with pytest.raises(ValueError, match="violated"):
        W.add_check_constraint(spark, path, "v_nonneg", "v >= 0")
    W.add_check_constraint(spark, path, "v_floor", "v >= -100")
    W.drop_check_constraint(path, "v_floor")
    W.enable_column_mapping(path)
    W.rename_column(path, "extra", "extra2")
    W.drop_column(path, "extra2")
    assert calls == [], calls

    DeltaLog.clear_cache()
    monkeypatch.setattr(DeltaLog, "snapshot", orig)
    snap = DeltaLog(path).snapshot()
    assert snap.metadata.get("description") == "light ddl"
    assert "extra2" not in {f.name for f in snap.schema.fields}
    assert DeltaTable(spark, path).to_df().count() == 416


def test_sql_routes_stay_light(spark, tmp_path, monkeypatch):
    """The pond.sql surface past the threshold: the routes that only
    need the header — DV-mode resolution (every SQL DML pays it),
    INSERT INTO column binding, SHOW TBLPROPERTIES / SHOW CREATE TABLE,
    CREATE TABLE LIKE, DROP/SET NOT NULL, and the broadcast-hint bind on
    every pond table read — must not replay the classic file list.
    SET NOT NULL's data probe is light-planned but REAL: a NULL-holding
    column must still be refused."""
    import os

    from athena_delta_lake_spark import DeltaPond

    root = tmp_path / "pond"
    os.makedirs(root / "s")
    path = str(root / "s" / "t")
    _mk_table(spark, path)
    # a nullable column with an actual NULL so SET NOT NULL must refuse
    pond = DeltaPond(spark, str(root))
    pond.sql("ALTER TABLE s.t ADD COLUMNS (maybe string)")
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(path).light_planning_engaged()

    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append(self.table_path)
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    pond.sql("INSERT INTO s.t VALUES (5000, 3, 2.5, 'ins', 'x')")
    pond.sql("SHOW TBLPROPERTIES s.t").collect()
    pond.sql("SHOW CREATE TABLE s.t").collect()
    pond.sql("CREATE TABLE s.t_like LIKE s.t")
    pond.sql("ALTER TABLE s.t ALTER COLUMN maybe DROP NOT NULL")
    with pytest.raises(ValueError, match="NULL"):
        pond.sql("ALTER TABLE s.t ALTER COLUMN maybe SET NOT NULL")
    # DELETE end-to-end: _dv_mode + candidate planning (the Catalyst-
    # rendered condition must parse into prune triples) + commit, light
    pond.sql("DELETE FROM s.t WHERE id = 5000")
    # the broadcast-hint bind on a plain read
    pond.read("s", "t").count()
    # t_like is a freshly created BELOW-threshold table — classic there
    # is the designed fallback; only the big table must stay light
    assert [c for c in calls if c.endswith("/s/t")] == [], calls

    monkeypatch.setattr(DeltaLog, "snapshot", orig)
    DeltaLog.clear_cache()
    df = DeltaTable(spark, path).to_df()
    assert df.filter(F.col("id") == 5000).count() == 0
    assert df.count() == 416


def test_detail_and_partition_columns_stay_light(spark, tmp_path, monkeypatch):
    """DESCRIBE DETAIL's header facts and file aggregates, and the
    partition_columns accessor, must be classic-free past the threshold
    AND byte-identical to the classic answers."""
    path = str(tmp_path / "detail_light")
    _mk_table(spark, path)
    t = DeltaTable(spark, path)
    classic = t.detail()
    classic_pc = t.partition_columns()

    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(path).light_planning_engaged()
    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append(self.table_path)
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    light = t.detail()
    light_pc = t.partition_columns()
    assert calls == [], calls
    assert light == classic
    assert light_pc == classic_pc


def test_analyze_stays_light_and_matches_classic(spark, tmp_path, monkeypatch):
    """ANALYZE's size/rowCount fold is pure file-metadata arithmetic:
    past the threshold it runs as one executor-side files_df pass and
    stores the SAME properties the classic per-file loop derives."""
    import os

    from athena_delta_lake_spark import DeltaPond

    root = tmp_path / "pond"
    os.makedirs(root / "s")
    a, b = str(root / "s" / "a"), str(root / "s" / "b")
    for p in (a, b):
        _mk_table(spark, p, dv=True)  # DV cardinality exercises the fold
    pond = DeltaPond(spark, str(root))
    pond.sql("ANALYZE TABLE s.a COMPUTE STATISTICS").collect()
    want = {
        k: v
        for k, v in (
            DeltaLog(a).snapshot().metadata.get("configuration") or {}
        ).items()
        if k.startswith("pond.stats.")
    }

    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(b).light_planning_engaged()
    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append(self.table_path)
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    pond.sql("ANALYZE TABLE s.b COMPUTE STATISTICS").collect()
    assert [c for c in calls if c.endswith("/s/b")] == [], calls
    monkeypatch.setattr(DeltaLog, "snapshot", orig)
    DeltaLog.clear_cache()
    got = {
        k: v
        for k, v in (
            DeltaLog(b).snapshot().metadata.get("configuration") or {}
        ).items()
        if k.startswith("pond.stats.")
    }
    assert got == want


def test_restore_stays_light_and_equals_classic(spark, tmp_path, monkeypatch):
    """RESTORE past the threshold computes its re-add/remove diff
    executor-side (classic materialized BOTH snapshots driver-side) and
    must land a byte-identical table state: twin tables get the same
    edit history (appends, a MOR delete growing a DV, a COW delete),
    one restores classically, one through the light plane with
    DeltaLog.snapshot poisoned."""
    paths = [str(tmp_path / "ra"), str(tmp_path / "rb")]
    for p in paths:
        _mk_table(spark, p, dv=True)  # checkpoint at the DV'd state
        # post-checkpoint history to restore away: a COW delete and an
        # append; plus a MOR delete that GROWS an existing DV (same-path
        # fingerprint change the diff must catch)
        DeltaTable(spark, p).delete(where="id % 41 = 0", mode="mor")
        DeltaTable(spark, p).delete(where="part = 6")
    target_v = 2  # the post-MOR-delete version: checkpoint(v1) + 1-commit overlay
    DeltaLog.clear_cache()
    from athena_delta_lake_spark.delta.dml import restore_table

    res_a = restore_table(paths[0], version=target_v)

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    assert DeltaLog(paths[1]).light_planning_engaged()
    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append(self.table_path)
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    res_b = restore_table(paths[1], version=target_v)
    assert calls == [], calls
    monkeypatch.setattr(DeltaLog, "snapshot", orig)
    DeltaLog.clear_cache()

    assert res_a["files_added"] == res_b["files_added"]
    assert res_a["files_removed"] == res_b["files_removed"]
    assert res_a["metadata_restored"] == res_b["metadata_restored"]
    assert _rows(DeltaTable(spark, paths[0]).to_df()) == _rows(
        DeltaTable(spark, paths[1]).to_df()
    )
    # the restored state matches the target version exactly
    assert _rows(DeltaTable(spark, paths[1]).to_df()) == _rows(
        DeltaTable(spark, paths[1]).to_df(version=target_v)
    )


def test_restore_below_newest_checkpoint_stays_light(
    spark, tmp_path, monkeypatch
):
    """RESTORE (and time travel) to a version BELOW the newest checkpoint
    must still plan light when an OLDER complete checkpoint + commit tail
    reaches the target — found by meta_scale --lifecycle at 10^7:
    checkpoint -> RESTORE to a pre-checkpoint version silently replayed
    the classic snapshot (18.7 GiB / 602 s vs 190 MiB light). Twin-table
    classic equality with DeltaLog.snapshot poisoned on the light twin."""
    from athena_delta_lake_spark.delta.dml import restore_table

    paths = [str(tmp_path / "ca"), str(tmp_path / "cb")]
    for p in paths:
        write_delta(
            spark.createDataFrame(
                [(i, i % 4, float(i)) for i in range(200)],
                "id long, part int, v double",
            ),
            p,
            partition_by=["part"],
        )  # v0
        write_checkpoint(p)  # OLD checkpoint @ v0
        write_delta(
            spark.createDataFrame(
                [(1000 + i, i % 4, -1.0) for i in range(10)],
                "id long, part int, v double",
            ),
            p,
            mode="append",
        )  # v1  <- restore target
        DeltaTable(spark, p).delete(where="id % 7 = 0", mode="mor")  # v2
        write_checkpoint(p)  # NEW checkpoint @ v2
        write_delta(
            spark.createDataFrame(
                [(2000, 0, 9.0)], "id long, part int, v double"
            ),
            p,
            mode="append",
        )  # v3
    DeltaLog.clear_cache()
    target_v = 1

    res_a = restore_table(paths[0], version=target_v)  # classic twin

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    DeltaLog.clear_cache()
    # the version-aware engagement: below the newest checkpoint but
    # reachable via the old one
    assert DeltaLog(paths[1]).light_planning_engaged(target_v)
    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append((self.table_path, version))
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    res_b = restore_table(paths[1], version=target_v)
    # time travel below the newest checkpoint plans light too
    tt = _rows(DeltaTable(spark, paths[1]).to_df(version=target_v))
    assert calls == [], calls
    monkeypatch.setattr(DeltaLog, "snapshot", orig)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()

    assert res_a["files_added"] == res_b["files_added"]
    assert res_a["files_removed"] == res_b["files_removed"]
    assert _rows(DeltaTable(spark, paths[0]).to_df()) == _rows(
        DeltaTable(spark, paths[1]).to_df()
    )
    assert tt == _rows(DeltaTable(spark, paths[1]).to_df())


def test_engagement_declines_unreachable_old_version(
    spark, tmp_path, monkeypatch
):
    """With the old checkpoint's parts gone (log cleanup), a target below
    the newest checkpoint must NOT engage light — classic fallback (which
    replays from v0 commits when they survive) stays the router."""
    import glob
    import os

    p = str(tmp_path / "gone")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "id long, v double"
        ),
        p,
    )  # v0
    write_checkpoint(p)  # old cp @ v0
    write_delta(
        spark.createDataFrame([(100, 1.0)], "id long, v double"),
        p,
        mode="append",
    )  # v1
    write_checkpoint(p)  # new cp @ v1
    # remove the OLD checkpoint parts (v0) only
    for f in glob.glob(
        os.path.join(p, "_delta_log", f"{0:020d}.checkpoint*")
    ):
        os.remove(f)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    assert DeltaLog(p).light_planning_engaged(1)
    assert not DeltaLog(p).light_planning_engaged(0)


def test_torn_checkpoint_does_not_shadow_older_complete(
    spark, tmp_path, monkeypatch
):
    """A torn multi-part checkpoint between the target version and an
    older complete one must not shadow it: both snapshot() and
    snapshot_light() now pick the newest COMPLETE checkpoint <= version
    (round-11 second review pass). With commit 0 already cleaned (legal:
    it predates the complete v0... checkpoint), the old bare-max pick
    degraded to an unreplayable full-tail walk."""
    import glob
    import os

    p = str(tmp_path / "torn")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(60)], "id long, v double"
        ),
        p,
    )  # v0
    write_checkpoint(p)  # complete checkpoint @ v0
    write_delta(
        spark.createDataFrame([(100, 1.0)], "id long, v double"),
        p,
        mode="append",
    )  # v1
    write_checkpoint(p, parts=2)  # multi-part @ v1 — torn below
    write_delta(
        spark.createDataFrame([(200, 2.0)], "id long, v double"),
        p,
        mode="append",
    )  # v2
    write_checkpoint(p)  # newest @ v2 (_last_checkpoint points here)
    log_dir = os.path.join(p, "_delta_log")
    torn = sorted(
        glob.glob(os.path.join(log_dir, f"{1:020d}.checkpoint.0000000001.*"))
    )
    assert torn, "expected a multi-part v1 checkpoint to tear"
    for f in torn:
        os.remove(f)
    # commit 0 cleaned (it predates the complete v0 checkpoint)
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    DeltaLog.clear_cache()

    # classic replay at v1: must come from the v0 checkpoint + commit 1
    snap = DeltaLog(p).snapshot(1)
    assert snap.num_files >= 1
    rows = _rows(DeltaTable(spark, p).to_df(version=1))
    assert len(rows) == 61

    # light plane agrees and the below-checkpoint engagement serves v1
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    DeltaLog.clear_cache()
    assert DeltaLog(p).light_planning_engaged(1)
    lt = DeltaLog(p).snapshot_light(1)
    assert lt.version == 1
    assert _rows(DeltaTable(spark, p).to_df(version=1)) == rows
