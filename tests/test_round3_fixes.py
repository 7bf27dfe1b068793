"""Round-3 defect regressions: row tracking across CLONE / RESTORE /
DSv2 writes, SQL three-valued logic in partition pruning (metadata-only
count correctness), deep-cloning tables with absolute add paths, and the
executor-side deletion-vector build (driver never holds matched row
indexes)."""

import json
import os

import pytest

from athena_delta_lake_spark.delta import (
    DeltaLog,
    DeltaTable,
    clone_table,
    enable_row_tracking,
    write_delta,
)
from athena_delta_lake_spark.delta.dml import delete_mor, restore_table, update
from athena_delta_lake_spark.delta.stats import prune_files
from athena_delta_lake_spark.delta.writer import _ROW_TRACKING_DOMAIN, _row_id_hwm


def _ids(spark, path):
    return {
        r["id"]: r["_row_id"]
        for r in DeltaTable(spark, path).to_df_with_row_ids().collect()
    }


@pytest.fixture()
def rt_tbl(spark, tmp_path):
    path = str(tmp_path / "rt_src")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, k int, v double"
    ).coalesce(2)
    write_delta(df, path)
    enable_row_tracking(path)
    return path


# ------------------------------------------------------- clone x row tracking


def test_clone_preserves_row_ids_and_high_water_mark(spark, rt_tbl, tmp_path):
    # force one rewritten file (materialized ids) + one fresh file
    update(spark, rt_tbl, {"v": "v + 0.5"}, where="id = 7")
    before = _ids(spark, rt_tbl)

    dst = str(tmp_path / "rt_clone")
    clone_table(rt_tbl, dst)

    # never-rewritten files must NOT read NULL _row_id on the clone
    assert _ids(spark, dst) == before

    # the rowIdHighWaterMark domain travels with the clone: the first
    # clone-side append must mint ids ABOVE every existing id
    src_hwm = _row_id_hwm(DeltaLog(rt_tbl).snapshot().domain_metadata)
    dst_hwm = _row_id_hwm(DeltaLog(dst).snapshot().domain_metadata)
    assert dst_hwm == src_hwm >= 29

    write_delta(
        spark.createDataFrame([(100, 0, 1.0)], "id long, k int, v double"),
        dst,
        mode="append",
    )
    after = _ids(spark, dst)
    assert after[100] > src_hwm
    assert len(set(after.values())) == len(after)  # all ids still unique


def test_deep_clone_of_shallow_clone_materializes_bytes(spark, rt_tbl, tmp_path):
    # a shallow clone's add paths are ABSOLUTE; deep-cloning it used to
    # os.path.join into the SOURCE file and crash with SameFileError
    shallow = str(tmp_path / "shallow")
    clone_table(rt_tbl, shallow)
    deep = str(tmp_path / "deep")
    clone_table(shallow, deep, shallow=False)

    snap = DeltaLog(deep).snapshot()
    assert all(not f.path.startswith("/") for f in snap.files)
    for f in snap.files:
        assert os.path.exists(os.path.join(deep, f.path))
    assert (
        DeltaTable(spark, deep).to_df().count()
        == DeltaTable(spark, rt_tbl).to_df().count()
    )


# ----------------------------------------------------- restore x row tracking


def test_restore_keeps_row_ids(spark, rt_tbl):
    before = _ids(spark, rt_tbl)
    v0 = DeltaLog(rt_tbl).snapshot().version
    update(spark, rt_tbl, {"v": "v * 2"}, where="id < 10")
    restore_table(rt_tbl, version=v0)
    assert _ids(spark, rt_tbl) == before
    snap = DeltaLog(rt_tbl).snapshot()
    assert all(f.base_row_id is not None for f in snap.files)


def test_restore_column_mapped_writes_physical_partition_values(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import (
        enable_column_mapping,
        rename_column,
    )

    path = str(tmp_path / "cm_tbl")
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, p int"
    )
    write_delta(df, path, partition_by=["p"])
    enable_column_mapping(path)
    rename_column(path, "p", "bucket")
    v = DeltaLog(path).snapshot().version
    # a rewrite (not an append) forces the restore to RE-ADD the original
    # files — the path under test
    update(spark, path, {"id": "id + 1000"}, where="id < 5")
    restore_table(path, version=v)

    # the restore's re-adds must key partitionValues by the PHYSICAL name
    # (raw log check — snapshot replay would normalize and hide a slip)
    last = DeltaLog(path).snapshot().version
    raw = open(
        os.path.join(path, "_delta_log", f"{last:020d}.json")
    ).read().splitlines()
    readds = [
        json.loads(l)["add"] for l in raw if "\"add\"" in l
    ]
    assert readds, "restore should re-add the replaced files"
    for a in readds:
        assert "bucket" not in a["partitionValues"]  # logical name absent
    assert DeltaTable(spark, path).to_df().count() == 10
    got = {r["bucket"] for r in DeltaTable(spark, path).to_df().collect()}
    assert got == {0, 1}


# -------------------------------------------------- DSv2 write x row tracking


def test_dsv2_append_assigns_row_ids(spark, rt_tbl):
    from athena_delta_lake_spark.sources.deltapond_source import register

    register(spark)
    src_hwm = _row_id_hwm(DeltaLog(rt_tbl).snapshot().domain_metadata)
    spark.createDataFrame(
        [(200, 1, 2.0), (201, 2, 3.0)], "id long, k int, v double"
    ).write.format("deltapond").mode("append").save(rt_tbl)

    snap = DeltaLog(rt_tbl).snapshot()
    assert all(f.base_row_id is not None for f in snap.files)
    new_hwm = _row_id_hwm(snap.domain_metadata)
    assert new_hwm == src_hwm + 2
    ids = _ids(spark, rt_tbl)
    assert ids[200] > src_hwm and ids[201] > src_hwm
    assert len(set(ids.values())) == len(ids)


# ------------------------------------------------- 3VL in partition pruning


def test_null_partition_pruning_is_exact(spark, tmp_path):
    path = str(tmp_path / "null_part")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None), (5, None), (6, None)],
        "id long, p string",
    ).repartition("p")
    write_delta(df, path, partition_by=["p"])
    t = DeltaTable(spark, path)
    snap = t.snapshot()

    # col != x excludes NULL rows under SQL 3VL — metadata-only count must
    # not sum NULL-partition files (it used to overcount by 3 here)
    assert t.count(where=[("p", "!=", "a")]) == 1
    assert t.count(where="p != 'a'") == 1
    # NULL IN (...) is never TRUE
    assert t.count(where=[("p", "in", ["a", "b"])]) == 3
    kept = prune_files(snap, [("p", "in", ["a", "b"])])
    assert all(f.partition_values.get("p") is not None for f in kept)
    # ('p','=',None) is the null-safe IS NULL form: keeps ONLY null files
    kept_null = prune_files(snap, [("p", "=", None)])
    assert kept_null and all(
        f.partition_values.get("p") is None for f in kept_null
    )
    assert t.count(where=[("p", "=", None)]) == 3


# --------------------------------------------- executor-side deletion vectors


def test_mor_delete_never_collects_row_indexes(spark, tmp_path, monkeypatch):
    """The driver may collect per-FILE descriptor rows, never per-ROW
    indexes: cap every DataFrame.collect() during a MOR delete matching
    20k rows at the file count (plus slack), which the old
    collect_list(_row_idx) implementation blows past by 3 orders."""
    path = str(tmp_path / "big_mor")
    write_delta(
        spark.range(40_000).selectExpr("id", "id % 8 as k").repartition(8),
        path,
    )
    n_files = len(DeltaLog(path).snapshot().files)
    cap = n_files + 16

    # patch the CONCRETE class (pyspark 4's classic DataFrame overrides
    # the pyspark.sql.DataFrame methods, so patching the base misses)
    df_cls = type(spark.range(1))
    real_collect = df_cls.collect
    seen = []

    def capped(self):
        rows = real_collect(self)
        seen.append(len(rows))
        assert len(rows) <= cap, (
            f"driver-side collect of {len(rows)} rows during MOR delete "
            f"(cap {cap}): matched row indexes must stay executor-side"
        )
        return rows

    monkeypatch.setattr(df_cls, "collect", capped)
    res = delete_mor(spark, path, where="id % 2 = 0")
    monkeypatch.undo()

    assert res["rows_deleted"] == 20_000
    assert seen, "expected at least one (descriptor) collect"
    assert DeltaTable(spark, path).to_df().count() == 20_000
    got = DeltaTable(spark, path).to_df().selectExpr("min(id % 2) as m").first()
    assert got["m"] == 1


def test_mor_delete_accumulates_existing_dvs_executor_side(spark, tmp_path):
    path = str(tmp_path / "mor_accum")
    write_delta(spark.range(100).selectExpr("id").coalesce(1), path)
    delete_mor(spark, path, where="id < 10")
    delete_mor(spark, path, where="id >= 90")  # second pass must MERGE
    t = DeltaTable(spark, path)
    assert t.to_df().count() == 80
    ids = {r["id"] for r in t.to_df().collect()}
    assert ids == set(range(10, 90))
