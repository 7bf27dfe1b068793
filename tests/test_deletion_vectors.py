"""Deletion-vector (deletionVectors reader feature) support.

Tables are hand-built the way a modern third-party writer (Databricks /
delta-rs with DVs enabled) lays them out: parquet data files + add
actions carrying `deletionVector` descriptors + a feature-gated protocol.
The reference engine (delta-standalone 0.2.0) predates DVs and would
resurrect deleted rows; here they must stay deleted across scan, DML,
checkpoint replay, and RESTORE."""

import json
import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from athena_delta_lake_spark import DeltaTable
from athena_delta_lake_spark.delta import deletion_vectors as dv
from athena_delta_lake_spark.delta.log import DeltaLog


def _commit(log_dir: str, version: int, actions: list[dict]) -> None:
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


_PROTOCOL = {
    "protocol": {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
}


def _schema_string(partitioned: bool) -> str:
    fields = [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "integer", "nullable": True, "metadata": {}},
    ]
    if partitioned:
        fields.append(
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}}
        )
    return json.dumps({"type": "struct", "fields": fields})


def _meta(partitioned: bool) -> dict:
    return {
        "metaData": {
            "id": "dv-test",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(partitioned),
            "partitionColumns": ["p"] if partitioned else [],
            "configuration": {},
        }
    }


def _data_file(table_path: str, rel: str, ids: list[int]) -> dict:
    """Write a parquet file with known row order; return its add action."""
    full = os.path.join(table_path, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    t = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "v": pa.array([i * 10 for i in ids], pa.int32()),
        }
    )
    pq.write_table(t, full)
    return {
        "path": rel,
        "partitionValues": {},
        "size": os.path.getsize(full),
        "modificationTime": 0,
        "dataChange": True,
        "stats": json.dumps({"numRecords": len(ids)}),
    }


@pytest.fixture
def dv_table(spark, tmp_path):
    """Unpartitioned table, two files; file A has rows 0,2,4 DV-deleted,
    file B has no DV."""
    path = str(tmp_path / "dv_tbl")
    os.makedirs(path)
    add_a = _data_file(path, "part-a.parquet", list(range(10)))
    add_b = _data_file(path, "part-b.parquet", list(range(10, 20)))
    desc = dv.write_dv_file(path, [0, 2, 4])
    add_a["deletionVector"] = desc
    _commit(
        os.path.join(path, "_delta_log"),
        0,
        [_PROTOCOL, _meta(False), {"add": add_a}, {"add": add_b}],
    )
    DeltaLog.clear_cache()
    return path


def test_dv_scan_excludes_deleted(spark, dv_table):
    t = DeltaTable(spark, dv_table)
    got = sorted(r["id"] for r in t.to_df().collect())
    assert got == [1, 3, 5, 6, 7, 8, 9] + list(range(10, 20))
    # values preserved for survivors
    assert {r["v"] for r in t.to_df().filter("id = 3").collect()} == {30}


def test_dv_inline_descriptor(spark, tmp_path):
    path = str(tmp_path / "dv_inline")
    os.makedirs(path)
    add = _data_file(path, "part-a.parquet", list(range(8)))
    bitmap = dv.serialize_roaring64([1, 6])
    bitmap += b"\x00" * (-len(bitmap) % 4)  # z85 needs %4
    add["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": dv.z85_encode(bitmap),
        "sizeInBytes": len(bitmap),
        "cardinality": 2,
    }
    _commit(os.path.join(path, "_delta_log"), 0, [_PROTOCOL, _meta(False), {"add": add}])
    DeltaLog.clear_cache()
    got = sorted(r["id"] for r in DeltaTable(spark, path).to_df().collect())
    assert got == [0, 2, 3, 4, 5, 7]


def test_dv_replaced_by_rewrite(spark, dv_table):
    """A later commit re-adding the file WITHOUT a DV resurrects its rows
    (the add replaces the prior one wholesale — last-writer-wins)."""
    snap = DeltaLog(dv_table).snapshot()
    a = next(f for f in snap.files if f.path == "part-a.parquet")
    _commit(
        os.path.join(dv_table, "_delta_log"),
        1,
        [
            {
                "add": {
                    "path": a.path,
                    "partitionValues": {},
                    "size": a.size,
                    "modificationTime": 1,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": 10}),
                }
            }
        ],
    )
    DeltaLog.clear_cache()
    t = DeltaTable(spark, dv_table)
    assert t.to_df().count() == 20
    # time travel still sees the DV state
    assert t.to_df(version=0).count() == 17


def test_dv_dml_delete_respects_dv(spark, dv_table):
    """Copy-on-write DELETE on a DV table must not resurrect DV'd rows in
    the rewritten files."""
    t = DeltaTable(spark, dv_table)
    res = t.delete(where="id >= 15")
    assert res["rows_deleted"] == 5
    got = sorted(r["id"] for r in t.to_df().collect())
    assert got == [1, 3, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]


def test_dv_checkpoint_roundtrip(spark, dv_table):
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    write_checkpoint(dv_table)
    # force checkpoint-based replay by clearing cache; version 0 commit is
    # still there but the checkpoint path must carry the DV through
    DeltaLog.clear_cache()
    snap = DeltaLog(dv_table).snapshot()
    a = next(f for f in snap.files if f.path == "part-a.parquet")
    assert a.deletion_vector is not None
    assert int(a.deletion_vector["cardinality"]) == 3
    assert DeltaTable(spark, dv_table).to_df().count() == 17


def test_dv_restore_preserves_dv(spark, dv_table):
    t = DeltaTable(spark, dv_table)
    t.delete(where="id >= 15")  # v1 rewrites part-b
    t.restore(version=0)  # v2: re-add part-b, keep part-a's DV
    assert t.to_df().count() == 17
    snap = t.snapshot()
    a = next(f for f in snap.files if f.path == "part-a.parquet")
    assert a.deletion_vector is not None


def test_unsupported_reader_feature_rejected(spark, tmp_path):
    path = str(tmp_path / "future_tbl")
    os.makedirs(path)
    add = _data_file(path, "part-a.parquet", [1, 2, 3])
    _commit(
        os.path.join(path, "_delta_log"),
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors", "someFutureFeature"],
                    "writerFeatures": [],
                }
            },
            _meta(False),
            {"add": add},
        ],
    )
    DeltaLog.clear_cache()
    with pytest.raises(ValueError, match="someFutureFeature"):
        DeltaLog(path).snapshot()


def test_run_container_parse():
    """Hand-encode a portable roaring bitmap with a RUN container (cookie
    12347 + run flag) — writers like RoaringBitmap.runOptimize() emit
    these; the parser must expand runs exactly."""
    # one 32-bit bitmap, one run container: runs [(5, len 3), (100, len 0)]
    bm32 = struct.pack("<i", (0 << 16) | 12347)  # n_cont-1=0, cookie
    bm32 += b"\x01"  # run flag bitset: container 0 is a run
    bm32 += struct.pack("<HH", 0, 5 - 1)  # key 0, cardinality-1 (5 values)
    # < 4 containers -> no offset header
    bm32 += struct.pack("<H", 2)  # n_runs
    bm32 += struct.pack("<HH", 5, 3)  # 5,6,7,8
    bm32 += struct.pack("<HH", 100, 0)  # 100
    data = struct.pack("<iq", 1681511377, 1) + bm32
    assert dv.parse_roaring64(data) == [5, 6, 7, 8, 100]


def test_bitmap_container_roundtrip():
    """> 4096 values in one 16-bit chunk forces a bitmap container on the
    parse side (serialize via raw struct, parse with ours)."""
    vals = list(range(0, 10000, 2))  # 5000 values, chunk 0
    words = [0] * 1024
    for v in vals:
        words[v >> 6] |= 1 << (v & 63)
    bm32 = struct.pack("<ii", 12346, 1)
    bm32 += struct.pack("<HH", 0, len(vals) - 1)
    bm32 += struct.pack("<i", 16)  # offset header (1 container)
    bm32 += struct.pack("<1024Q", *words)
    data = struct.pack("<iq", 1681511377, 1) + bm32
    assert dv.parse_roaring64(data) == vals


def test_delete_mor_writes_dv(spark, tmp_path):
    """Merge-on-read DELETE: DV blob instead of file rewrite; second MOR
    delete merges positions; OPTIMIZE purges; VACUUM reaps the blobs."""
    from athena_delta_lake_spark import write_delta

    path = str(tmp_path / "mor_tbl")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(400)], "id long, p int"
    ).repartition(2)
    write_delta(df, path)
    t = DeltaTable(spark, path)
    files_v0 = {f.path for f in t.snapshot().files}

    res = t.delete(where="id % 10 = 0", mode="mor")
    assert res["rows_deleted"] == 40
    assert res["files_added"] == len(files_v0)  # re-added with DVs
    assert res["dv_files_written"] == 1  # one shared blob
    assert {f.path for f in t.snapshot().files} == files_v0  # no rewrite
    assert all(f.deletion_vector for f in t.snapshot().files)
    assert t.to_df().count() == 360
    assert t.to_df().filter("id % 10 = 0").count() == 0
    # protocol upgraded
    assert "deletionVectors" in t.snapshot().protocol["readerFeatures"]

    # second MOR delete merges with existing DVs
    res2 = t.delete(where="id < 50", mode="mor")
    assert res2["rows_deleted"] == 45  # 50 minus the 5 already DV'd
    assert t.to_df().count() == 315
    # time travel sees each DV state
    assert t.to_df(version=0).count() == 400
    assert t.to_df(version=1).count() == 360

    # OPTIMIZE purges the DVs physically
    t.compact()
    snap = t.snapshot()
    assert all(f.deletion_vector is None for f in snap.files)
    assert t.to_df().count() == 315
    # VACUUM reaps the now-orphaned blobs (and old parquet)
    reaped = t.vacuum(retention_hours=0.0)
    assert any(f.startswith("deletion_vector_") for f in reaped["files"])
    assert t.to_df().count() == 315


def test_delete_mor_drops_fully_deleted_files(spark, tmp_path):
    from athena_delta_lake_spark import write_delta

    path = str(tmp_path / "mor_full")
    df = spark.createDataFrame([(i, i % 2) for i in range(100)], "id long, p int")
    write_delta(df, path, partition_by=["p"])
    t = DeltaTable(spark, path)
    res = t.delete(where=[("p", "=", 1)], mode="mor")
    # whole partition matched -> files dropped, no DV written for them
    assert res["files_removed"] >= 1 and res["files_added"] == 0
    assert t.to_df().count() == 50 and t.to_df().filter("p = 1").count() == 0


def test_deltapond_source_applies_dv(spark, dv_table):
    """The deltapond Spark format (batch) must apply DVs too — both the
    pyarrow batch reader path and pushdown-pruned scans."""
    from athena_delta_lake_spark.sources.deltapond_source import (
        register as register_ds,
    )

    register_ds(spark)
    df = spark.read.format("deltapond").option("path", dv_table).load()
    assert df.count() == 17
    assert sorted(r["id"] for r in df.filter("id < 10").collect()) == [
        1, 3, 5, 6, 7, 8, 9,
    ]


def test_deltapond_stream_applies_dv(spark, dv_table):
    """Streaming replay from version 0: the add carrying a DV emits only
    live rows."""
    from athena_delta_lake_spark.sources.deltapond_source import (
        register as register_ds,
    )
    from athena_delta_lake_spark.streaming import run_to_memory

    register_ds(spark)
    stream = (
        spark.readStream.format("deltapond")
        .option("path", dv_table)
        .option("startingVersion", 0)
        .load()
    )
    out = run_to_memory(stream.groupBy().count(), "dv_stream_out", "complete")
    assert out.collect()[0]["count"] == 17


def test_dv_update_and_merge_respect_dv(spark, dv_table):
    """Copy-on-write UPDATE/MERGE rewrites on a DV table must not
    resurrect DV'd rows (ids 0,2,4 are gone)."""
    t = DeltaTable(spark, dv_table)
    t.update({"v": "v + 1000"}, where="id <= 3")
    got = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert 0 not in got and 2 not in got and 4 not in got
    assert got[1] == 1010 and got[3] == 1030 and got[5] == 50

    src = spark.createDataFrame([(6, -1), (99, -2)], "id long, v int")
    t.merge(src, keys=["id"])
    got = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert got[6] == -1 and got[99] == -2 and 0 not in got and len(got) == 18


def test_plain_scan_has_no_dv_join(spark, tmp_path):
    """Tables without DVs keep the untouched single-scan plan: no join,
    no row_index metadata in the physical plan."""
    from athena_delta_lake_spark import write_delta

    path = str(tmp_path / "plain_tbl")
    write_delta(spark.range(100).selectExpr("id", "id % 3 AS p"), path)
    df = DeltaTable(spark, path).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "row_index" not in plan


def test_serializer_bitmap_container_roundtrip():
    """> 4096 values per chunk now serialize as bitmap containers."""
    vals = sorted(set(list(range(0, 12000, 2)) + [70000, (1 << 32) + 5]))
    assert dv.parse_roaring64(dv.serialize_roaring64(vals)) == vals


def test_roaring_roundtrip_property():
    """Property: any position set round-trips through the serializer —
    mixed container types, chunk boundaries, high bits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.integers(min_value=0, max_value=200_000),
                st.integers(min_value=65_530, max_value=65_545),  # chunk edge
                st.integers(min_value=(1 << 32) - 5, max_value=(1 << 32) + 5),
            ),
            max_size=300,
        )
    )
    def check(positions):
        want = sorted(set(positions))
        assert dv.parse_roaring64(dv.serialize_roaring64(positions)) == want

    check()


def test_concurrent_mor_deletes_conflict(spark, tmp_path):
    """Two MOR deletes racing on the same file: the loser must NOT clobber
    the winner's deletion vector (lost-update), it must raise."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.delta.dml import delete_mor
    from athena_delta_lake_spark.delta.writer import (
        ConcurrentWriteError,
        _atomic_commit,
        _next_version,
    )

    path = str(tmp_path / "race_mor")
    # ONE data file so both deletes touch the same file (true write-write)
    write_delta(spark.range(100).coalesce(1).selectExpr("id"), path)

    import athena_delta_lake_spark.delta.writer as W

    orig = W._atomic_commit
    armed = {"on": True}

    def racing_atomic_commit(log_dir, version, actions):
        # the loser has already picked `version`; the winner's whole MOR
        # delete lands first, so the loser's create collides and retries
        if armed["on"]:
            armed["on"] = False
            delete_mor(spark, path, "id < 10")
        return orig(log_dir, version, actions)

    W._atomic_commit = racing_atomic_commit
    try:
        with pytest.raises(ConcurrentWriteError):
            delete_mor(spark, path, "id >= 90")
    finally:
        W._atomic_commit = orig
    # winner's deletions intact
    t = DeltaTable(spark, path)
    assert t.to_df().count() == 90
    assert t.to_df().filter("id < 10").count() == 0
