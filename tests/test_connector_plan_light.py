"""The Python DataSource batch connector plans WITHOUT the classic
snapshot replay: partitions() streams LightSnapshot.iter_files_local
(pyarrow checkpoint batches + tail overlay) and prunes per-file as the
stream flows — the planning worker has no SparkSession, so this was the
one scan route left that replayed a full classic snapshot (8.6 GiB of
worker RSS at 10^7 adds).

Pinned here: (1) plan equality with the classic snapshot+prune_files
ground truth across table shapes (checkpoint+tail, column mapping with
renames, deletion vectors, V2 checkpoints, checkpointless, time travel),
(2) the route is genuinely classic-free — DeltaLog.snapshot poisoned
while partitions() still plans correctly, (3) end-to-end read equality
with the native reader on the same shapes."""

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.stats import prune_files
from athena_delta_lake_spark.delta.writer import (
    enable_column_mapping,
    rename_column,
    write_checkpoint,
)
from athena_delta_lake_spark.sources.deltapond_source import (
    DeltaPondBatchReader,
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _plan(path, preds=None, version=None):
    """(file_path, sorted partition_values items, dv-path) triples from the
    connector's streaming planner, driven directly in-process."""
    opts = {"path": path}
    if version is not None:
        opts["versionAsOf"] = str(version)
    schema = DeltaLog(path).snapshot_light().schema
    r = DeltaPondBatchReader(opts, schema)
    if preds:
        r._preds = list(preds)
    return sorted(
        (
            p.file_path,
            tuple(sorted(p.partition_values.items())),
            (p.dv or {}).get("pathOrInlineDv"),
        )
        for p in r.partitions()
    )


def _classic(path, preds=None, version=None):
    """The same triples from the classic ground truth."""
    import os

    snap = DeltaLog(path).snapshot(version)
    return sorted(
        (
            os.path.join(path, f.path),
            tuple(
                sorted(
                    (c, f.partition_values.get(c))
                    for c in snap.partition_columns
                )
            ),
            (f.deletion_vector or {}).get("pathOrInlineDv"),
        )
        for f in prune_files(snap, preds or None)
    )


@pytest.fixture
def table(spark, tmp_path):
    """Partitioned table with a checkpoint mid-history and a tail of
    adds, a MOR delete (DV) and a COW delete after it — the reconcile
    shape iter_files_local must get right (checkpoint adds minus dead
    paths plus overlay)."""
    path = str(tmp_path / "t")
    rows = [(i, i % 4, float(i)) for i in range(40)]
    write_delta(
        spark.createDataFrame(rows, "id long, k long, v double"),
        path,
        partition_by=["k"],
    )
    t = DeltaTable(spark, path)
    write_delta(
        spark.createDataFrame(
            [(100 + i, i % 4, -1.0) for i in range(8)],
            "id long, k long, v double",
        ),
        path,
        mode="append",
    )
    write_checkpoint(path)
    # tail past the checkpoint: new adds, a DV'd file, a dead file
    write_delta(
        spark.createDataFrame(
            [(200 + i, i % 4, 7.5) for i in range(8)],
            "id long, k long, v double",
        ),
        path,
        mode="append",
    )
    t.delete(where="id = 3", mode="mor")
    t.delete(where="k = 2 AND id < 20", mode="cow")
    DeltaLog.clear_cache()
    return path


def test_plan_equals_classic_unfiltered(table):
    assert _plan(table) == _classic(table)


def test_plan_equals_classic_partition_pred(table):
    preds = [("k", "=", 1)]
    got = _plan(table, preds)
    assert got == _classic(table, preds)
    assert 0 < len(got) < len(_plan(table))


def test_plan_equals_classic_stats_pred(table):
    # data-column min/max skip: only files that can hold id >= 200
    preds = [("id", ">=", 200)]
    got = _plan(table, preds)
    assert got == _classic(table, preds)
    assert 0 < len(got) < len(_plan(table))


def test_plan_equals_classic_time_travel(table):
    for v in range(DeltaLog(table).latest_version() + 1):
        assert _plan(table, version=v) == _classic(table, version=v), v


def test_plan_is_classic_free(table, monkeypatch):
    """partitions() must never touch the classic replay — the planning
    worker can't afford it at 10^7 adds. Poison it and plan anyway."""

    def _boom(self, version=None):
        raise AssertionError("classic snapshot replay in connector plan")

    monkeypatch.setattr(DeltaLog, "snapshot", _boom)
    assert len(_plan(table, [("k", "=", 0)])) > 0
    assert len(_plan(table)) > 0


def test_plan_column_mapped_rename(spark, tmp_path):
    """Column mapping: checkpoint rows carry PHYSICAL partition keys; the
    stream must normalize them to logical names like the classic path."""
    path = str(tmp_path / "m")
    write_delta(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(12)],
            "id long, k long, v double",
        ),
        path,
        partition_by=["k"],
    )
    enable_column_mapping(path)
    rename_column(path, "k", "bucket")
    write_checkpoint(path)
    write_delta(
        spark.createDataFrame(
            [(50 + i, i % 3, 9.0) for i in range(6)],
            "id long, bucket long, v double",
        ),
        path,
        mode="append",
    )
    DeltaLog.clear_cache()
    assert _plan(path) == _classic(path)
    preds = [("bucket", "=", 1)]
    assert _plan(path, preds) == _classic(path, preds)
    # end-to-end: connector read equals native read on the mapped table
    got = sorted(
        tuple(r)
        for r in spark.read.format("deltapond")
        .load(path)
        .select("id", "bucket", "v")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in DeltaTable(spark, path)
        .to_df()
        .select("id", "bucket", "v")
        .collect()
    )
    assert got == want


def test_plan_v2_checkpoint(spark, tmp_path):
    path = str(tmp_path / "v2")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ),
        path,
    )
    write_checkpoint(path, v2=True)
    write_delta(
        spark.createDataFrame([(99, 1.0)], "id long, v double"),
        path,
        mode="append",
    )
    DeltaLog.clear_cache()
    assert _plan(path) == _classic(path)


def test_plan_checkpointless(spark, tmp_path):
    path = str(tmp_path / "nc")
    for i in range(3):
        write_delta(
            spark.createDataFrame(
                [(i, float(i))], "id long, v double"
            ),
            path,
            mode="append" if i else "overwrite",
        )
    DeltaLog.clear_cache()
    assert _plan(path) == _classic(path)
    assert len(_plan(path)) >= 3  # one file per append, no checkpoint
