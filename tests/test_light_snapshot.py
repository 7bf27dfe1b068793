"""LightSnapshot (round-7 ask #6): the driver-light snapshot mode for the
10^7+ file regime — header replayed without materializing checkpoint
AddFiles, file metadata consumed through files_df()/prune_df() where
executors read the checkpoint parquet. Equality-tested field-by-field
against the classic snapshot across checkpoints, tail DML, deletion
vectors, column mapping and multi-part/v2 checkpoints."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.stats import prune_files
from athena_delta_lake_spark.delta.writer import (
    enable_column_mapping,
    rename_column,
    write_checkpoint,
)


def _classic_rows(snap) -> list[tuple]:
    out = []
    for f in snap.files:
        nr = (f.stats or {}).get("numRecords")
        dv = (
            int(f.deletion_vector["cardinality"])
            if f.deletion_vector and "cardinality" in f.deletion_vector
            else None
        )
        out.append(
            (f.path, dict(f.partition_values or {}), f.size, nr, dv)
        )
    return sorted(out, key=lambda t: t[0])


def _light_rows(light, spark) -> list[tuple]:
    out = []
    for r in light.files_df(spark).collect():
        nr = None
        if r["stats"]:
            nr = json.loads(r["stats"]).get("numRecords")
        out.append(
            (
                r["path"],
                dict(r["partition_values"] or {}),
                r["size"],
                nr,
                r["dv_cardinality"],
            )
        )
    return sorted(out, key=lambda t: t[0])


def _assert_equal(spark, path, version=None):
    log = DeltaLog(path)
    snap = log.snapshot(version)
    light = log.snapshot_light(version)
    assert light.version == snap.version
    assert light.metadata == snap.metadata
    assert light.protocol == snap.protocol
    assert light.partition_columns == snap.partition_columns
    assert light.txns == snap.txns
    assert light.domain_metadata == snap.domain_metadata
    assert _light_rows(light, spark) == _classic_rows(snap)


def test_light_equals_classic_plain(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(90)],
            "id long, p int, v double",
        ),
        path,
        partition_by=["p"],
    )
    _assert_equal(spark, path)  # no checkpoint: overlay-only


def test_light_equals_classic_checkpoint_and_tail_dml(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(90)],
            "id long, p int, v double",
        ).repartition(4),
        path,
        partition_by=["p"],
    )
    write_delta(
        spark.createDataFrame(
            [(100 + i, i % 3, 0.0) for i in range(30)],
            "id long, p int, v double",
        ),
        path,
    )
    write_checkpoint(path)
    t = DeltaTable(spark, path)
    t.delete(where="id % 7 = 0", mode="mor")  # tail: DV re-adds
    t.update(set={"v": "v + 1"}, where="id < 5")  # tail: COW rewrite
    write_delta(
        spark.createDataFrame([(500, 1, 9.0)], "id long, p int, v double"),
        path,
    )
    _assert_equal(spark, path)
    # historical version straddling the checkpoint
    _assert_equal(spark, path, version=2)


def test_light_equals_classic_multipart_and_v2(spark, tmp_path):
    for kind in ("parts", "v2"):
        path = str(tmp_path / f"t_{kind}")
        write_delta(
            spark.range(200).selectExpr("id", "id % 4 AS k").repartition(6),
            path,
        )
        if kind == "parts":
            write_checkpoint(path, parts=3)
        else:
            write_checkpoint(path, v2=True, parts=2)
        write_delta(
            spark.range(200, 220).selectExpr("id", "id % 4 AS k"), path
        )
        _assert_equal(spark, path)


def test_light_equals_classic_column_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, i % 2, f"s{i}") for i in range(40)],
            "id long, p int, s string",
        ),
        path,
        partition_by=["p"],
    )
    enable_column_mapping(path)
    rename_column(path, "p", "bucket")
    write_checkpoint(path)
    write_delta(
        spark.createDataFrame(
            [(100, 0, "x"), (101, 1, "y")], "id long, bucket int, s string"
        ),
        path,
    )
    _assert_equal(spark, path)
    light = DeltaLog(path).snapshot_light()
    rows = light.files_df(spark).collect()
    # partition keys normalized to the LOGICAL name on both eras
    assert all("bucket" in (r["partition_values"] or {}) for r in rows)


def test_light_prune_matches_classic_prune(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, i % 5, float(i)) for i in range(500)],
            "id long, p int, v double",
        ).repartitionByRange(8, "id"),
        path,
        partition_by=["p"],
    )
    write_checkpoint(path)
    write_delta(
        spark.createDataFrame(
            [(1000 + i, i % 5, float(i)) for i in range(50)],
            "id long, p int, v double",
        ),
        path,
    )
    log = DeltaLog(path)
    snap = log.snapshot()
    light = log.snapshot_light()
    for preds in (
        [("p", "=", 2)],
        [("id", ">", 400)],
        [("p", "in", [0, 3]), ("id", "<=", 250)],
    ):
        want = sorted(f.path for f in prune_files(snap, preds))
        got = sorted(
            r["path"] for r in light.prune_df(spark, preds).collect()
        )
        assert got == want, preds


def test_light_path_with_plus_and_percent(spark, tmp_path):
    """url_decode is form-decoding: literal '+' in hive-escaped partition
    dirs must survive the light path decode."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "a+b"), (2, "c=d"), (3, "e%f")], "id long, g string"
        ),
        path,
        partition_by=["g"],
    )
    write_checkpoint(path)
    _assert_equal(spark, path)


def test_light_prune_uses_physical_stats_keys_on_mapped_table(spark, tmp_path):
    """Checkpoint stats are keyed by PHYSICAL column names on mapped
    tables; prune_df must translate the logical predicate column or it
    silently keeps every file (round-7 review finding)."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(400)], "id long, v double"
        ).repartitionByRange(8, "id"),
        path,
    )
    enable_column_mapping(path)
    rename_column(path, "id", "ident")  # physical name stays the old uuid-less form
    write_checkpoint(path)
    write_delta(
        spark.createDataFrame(
            [(1000 + i, 0.0) for i in range(20)], "ident long, v double"
        ).repartitionByRange(2, "ident"),
        path,
    )
    log = DeltaLog(path)
    snap = log.snapshot()
    light = log.snapshot_light()
    preds = [("ident", ">", 900)]
    want = sorted(f.path for f in prune_files(snap, preds))
    got = sorted(r["path"] for r in light.prune_df(spark, preds).collect())
    assert got == want
    # the prune genuinely skipped checkpoint-resident files
    assert len(got) < snap.num_files
