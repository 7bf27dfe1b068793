"""Write path + round-trip tests (the reference is read-only; SURVEY §2.C)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import write_checkpoint


@pytest.fixture
def tbl(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, a, b):
    return spark.range(a, b).select(
        F.col("id"),
        (F.col("id") % 3).alias("bucket"),
        (F.col("id") * 1.5).alias("val"),
    )


def test_roundtrip_unpartitioned(spark, tbl):
    write_delta(_mk(spark, 0, 100), tbl, partition_by=[])
    df = DeltaTable(spark, tbl).to_df()
    assert df.count() == 100
    assert set(df.columns) == {"id", "bucket", "val"}
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(100))


def test_append_and_time_travel(spark, tbl):
    write_delta(_mk(spark, 0, 100), tbl, partition_by=["bucket"])
    write_delta(_mk(spark, 100, 150), tbl)  # inherits partitioning
    t = DeltaTable(spark, tbl)
    assert t.to_df().count() == 150
    assert t.to_df(version=0).count() == 100
    assert t.partition_columns() == ["bucket"]


def test_overwrite_removes_prior_files(spark, tbl):
    write_delta(_mk(spark, 0, 100), tbl, partition_by=[])
    write_delta(_mk(spark, 0, 10), tbl, mode="overwrite", partition_by=[])
    t = DeltaTable(spark, tbl)
    assert t.to_df().count() == 10
    assert t.to_df(version=0).count() == 100  # old files retained on disk


def test_partition_mismatch_raises(spark, tbl):
    write_delta(_mk(spark, 0, 10), tbl, partition_by=["bucket"])
    with pytest.raises(ValueError, match="partition mismatch"):
        write_delta(_mk(spark, 10, 20), tbl, partition_by=[])


def test_stats_recorded_and_prune(spark, tbl):
    write_delta(_mk(spark, 0, 1000).repartitionByRange(4, "id"), tbl, partition_by=[])
    snap = DeltaLog(tbl).snapshot()
    assert all(f.stats and f.stats.get("numRecords") for f in snap.files)
    t = DeltaTable(spark, tbl)
    pruned = t.pruned_files([("id", "<", 10)])
    assert 0 < len(pruned) < snap.num_files  # range-partitioned: stats skip files
    assert t.to_df(predicates=[("id", "<", 10)]).filter(F.col("id") < 10).count() == 10


def test_checkpoint_replay(spark, tbl):
    write_delta(_mk(spark, 0, 50), tbl, partition_by=["bucket"])
    write_delta(_mk(spark, 50, 80), tbl)
    write_checkpoint(tbl)
    write_delta(_mk(spark, 80, 100), tbl)
    DeltaLog.clear_cache()
    t = DeltaTable(spark, tbl)
    assert t.to_df().count() == 100
    # checkpoint alone (commits removed below it) still replays
    for v in (0, 1):
        os.remove(os.path.join(tbl, "_delta_log", f"{v:020d}.json"))
    DeltaLog.clear_cache()
    assert DeltaTable(spark, tbl).to_df().count() == 100


def test_history(spark, tbl):
    write_delta(_mk(spark, 0, 10), tbl, partition_by=[])
    write_delta(_mk(spark, 10, 20), tbl)
    h = DeltaTable(spark, tbl).history()
    assert [e["version"] for e in h] == [1, 0]
    assert all(e["operation"] == "WRITE" for e in h)


def test_hive_escaped_partition_values(spark, tbl):
    """Partition values with '/', '=', space, unicode survive the
    write -> log -> replay -> scan round trip (URL-encoded add.path)."""
    df = spark.createDataFrame(
        [(1, "a/b"), (2, "c=d"), (3, "x y"), (4, "ü"), (5, None)],
        "id int, k string",
    )
    write_delta(df, tbl, partition_by=["k"])
    t = DeltaTable(spark, tbl)
    out = {r["k"]: r["id"] for r in t.to_df().collect()}
    assert out == {"a/b": 1, "c=d": 2, "x y": 3, "ü": 4, None: 5}
    assert len(t.pruned_files([("k", "=", "a/b")])) == 1


def test_escaped_partition_full_lifecycle(spark, tbl):
    """Operations that RE-EMIT snapshot paths (overwrite removes, DELETE
    rewrites, checkpoint adds, VACUUM liveness) must re-encode them: the
    snapshot holds URL-decoded physical names, the log stores encoded ones.
    Regression — overwrite used to leave escaped-partition files live
    (double-decode on replay), and VACUUM deleted live `%xx` files."""
    import os

    from athena_delta_lake_spark.delta.dml import vacuum
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    df = spark.createDataFrame(
        [(1, "a=b"), (2, "c/d"), (3, "ü x"), (4, "plain")], "id int, k string"
    )
    write_delta(df, tbl, partition_by=["k"])

    # VACUUM must never touch live escaped files
    out = vacuum(tbl, retention_hours=0.0)
    assert out["files"] == []
    t = DeltaTable(spark, tbl)
    assert t.to_df().count() == 4

    # overwrite must actually remove the escaped-partition files
    write_delta(df, tbl, partition_by=["k"], mode="overwrite")
    assert DeltaTable(spark, tbl).to_df().count() == 4

    # copy-on-write DELETE touching an escaped partition
    DeltaTable(spark, tbl).delete(where="k = 'a=b'")
    assert {r["k"] for r in DeltaTable(spark, tbl).to_df().collect()} == {
        "c/d",
        "ü x",
        "plain",
    }

    # checkpoint round trip (classic + v2) with escaped paths
    write_checkpoint(tbl)
    log_dir = os.path.join(tbl, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    DeltaLog.clear_cache()
    assert {r["k"] for r in DeltaTable(spark, tbl).to_df().collect()} == {
        "c/d",
        "ü x",
        "plain",
    }


def test_metadata_only_count(spark, tmp_path):
    from athena_delta_lake_spark import DeltaTable, write_delta

    path = str(tmp_path / "cnt")
    write_delta(spark.range(500).selectExpr("id"), path)
    t = DeltaTable(spark, path)
    assert t.count() == 500  # no scan: from stats
    t.delete(where="id < 100", mode="mor")
    assert t.count() == 400  # DV cardinality subtracted
    assert t.count(version=0) == 500
    assert t.count() == t.to_df().count()


def test_data_skipping_stats_columns(spark, tmp_path):
    """delta.dataSkippingNumIndexedCols / dataSkippingStatsColumns bound
    which columns carry per-file stats (log-size control on wide tables);
    pruning still works on indexed columns and stays CORRECT (no pruning,
    not wrong pruning) on unindexed ones."""
    import json

    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.delta import DeltaLog

    df = spark.range(100).selectExpr(
        "id AS a", "id * 2 AS b", "id * 3 AS c", "id * 4 AS d"
    )
    p1 = str(tmp_path / "t1")
    write_delta(
        df.repartition(4),
        p1,
        configuration={"delta.dataSkippingNumIndexedCols": "2"},
    )
    for f in DeltaLog(p1).snapshot().files:
        st = f.stats
        assert set(st["minValues"]) == {"a", "b"}
        assert set(st["nullCount"]) == {"a", "b"}
        assert st["numRecords"] > 0  # always recorded
    t = DeltaTable(spark, p1)
    # indexed column: stats prune; unindexed: all files survive, rows exact
    assert len(t.pruned_files([("a", ">", 1000)])) == 0
    assert len(t.pruned_files([("c", ">", 1000)])) == 4
    assert t.to_df(where="c > 270").count() == 9  # 91..99

    p2 = str(tmp_path / "t2")
    write_delta(
        df.repartition(2),
        p2,
        configuration={"delta.dataSkippingStatsColumns": "b, d"},
    )
    for f in DeltaLog(p2).snapshot().files:
        st = f.stats
        assert set(st["minValues"]) == {"b", "d"}

    # default (32) keeps stats on every column of a narrow table
    p3 = str(tmp_path / "t3")
    write_delta(df.repartition(2), p3)
    for f in DeltaLog(p3).snapshot().files:
        assert set(f.stats["minValues"]) == {"a", "b", "c", "d"}


def test_data_skipping_cols_with_column_mapping(spark, tmp_path):
    """The stats cap is configured in LOGICAL names but stats keys are
    PHYSICAL under column mapping — renamed columns keep their cap."""
    import json

    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.delta import DeltaLog
    from athena_delta_lake_spark.delta.writer import (
        enable_column_mapping,
        rename_column,
    )

    path = str(tmp_path / "t")
    write_delta(
        spark.range(20).selectExpr("id AS a", "id * 2 AS b"),
        path,
        configuration={"delta.dataSkippingStatsColumns": "b"},
    )
    enable_column_mapping(path)
    rename_column(path, "b", "bee")
    from athena_delta_lake_spark.delta.writer import set_table_properties

    set_table_properties(path, {"delta.dataSkippingStatsColumns": "bee"})
    write_delta(
        spark.range(20, 40).selectExpr("id AS a", "id * 2 AS bee"),
        path,
        mode="append",
    )
    snap = DeltaLog(path).snapshot()
    # replay shows stats under the LOGICAL name; only bee is indexed
    for f in snap.files:
        assert set(f.stats["minValues"]) == {"bee"}
    # and the on-disk add actions keyed them by the PHYSICAL name ("b")
    import glob
    import os

    last = sorted(glob.glob(os.path.join(path, "_delta_log", "*.json")))[-1]
    raw_adds = [
        json.loads(json.loads(line)["add"]["stats"])
        for line in open(last)
        if '"add"' in line
    ]
    assert raw_adds and all(
        set(st["minValues"]) == {"b"} for st in raw_adds
    )


def test_data_skipping_num_indexed_counts_partition_columns(spark, tmp_path):
    """Delta positional semantics: NumIndexedCols counts the FULL table
    schema — a leading partition column consumes an index slot even
    though partition values never need file stats."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.delta import DeltaLog

    path = str(tmp_path / "t")
    write_delta(
        spark.range(40).selectExpr("CAST(id % 2 AS INT) AS p", "id AS a", "id * 2 AS b"),
        path,
        partition_by=["p"],
        configuration={"delta.dataSkippingNumIndexedCols": "2"},
    )
    for f in DeltaLog(path).snapshot().files:
        # slots: p (partition, no file stats) + a; b is past the cap
        assert set(f.stats["minValues"]) == {"a"}
        assert f.stats["numRecords"] > 0
