"""Partition + stats pruning behavior (SURVEY §5.3): pruned files never
enter the scan plan; Delta-removed files are never read."""

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.stats import prune_files


@pytest.fixture
def part_tbl(spark, tmp_path):
    path = str(tmp_path / "events_tbl")
    df = spark.createDataFrame(
        [(i, 2020 + i % 3, i % 12 + 1, float(i)) for i in range(600)],
        "id int, year int, month int, v double",
    )
    write_delta(df, path, partition_by=["year", "month"])
    return path


def test_partition_pruning_file_count(spark, part_tbl):
    t = DeltaTable(spark, part_tbl)
    snap = t.snapshot()
    pruned = t.pruned_files([("year", "=", 2021)])
    assert all(f.partition_values["year"] == "2021" for f in pruned)
    assert len(pruned) < snap.num_files
    df = t.to_df(predicates=[("year", "=", 2021)])
    # only pruned files are in the read plan
    assert df.count() == sum(1 for i in range(600) if 2020 + i % 3 == 2021)


def test_pruning_ops(spark, part_tbl):
    t = DeltaTable(spark, part_tbl)
    n_all = t.snapshot().num_files
    assert len(t.pruned_files([("year", ">=", 2022)])) < n_all
    assert len(t.pruned_files([("month", "in", [1, 2])])) < n_all
    assert len(t.pruned_files([("year", "!=", 2020)])) < n_all
    assert len(t.pruned_files([("year", "=", 1999)])) == 0
    # empty result still yields a well-formed empty DataFrame
    df = t.to_df(predicates=[("year", "=", 1999)])
    assert df.count() == 0 and "v" in df.columns


def test_removed_files_never_scanned(spark, part_tbl):
    """The directory-listing shortcut would read stale files; the log-driven
    scan must not (SURVEY §5.3)."""
    t = DeltaTable(spark, part_tbl)
    before = t.to_df().count()
    # overwrite with a subset: old files remain on disk but are removed
    keep = t.to_df().filter(F.col("id") < 100)
    write_delta(keep, part_tbl, mode="overwrite", partition_by=["year", "month"])
    DeltaLog.clear_cache()
    t2 = DeltaTable(spark, part_tbl)
    assert t2.to_df().count() == 100 < before
    # physical files on disk exceed live files (old ones still present)
    import glob
    import os

    on_disk = glob.glob(os.path.join(part_tbl, "**", "*.parquet"), recursive=True)
    on_disk = [p for p in on_disk if "_delta_log" not in p]
    assert len(on_disk) > t2.snapshot().num_files


def test_partition_filter_prunes_in_plan(spark, part_tbl):
    """Catalyst-level check: with hive-style paths + basePath, the partition
    filter reaches the scan as a partition filter (no data read for pruned
    dirs)."""
    t = DeltaTable(spark, part_tbl)
    df = t.to_df().filter(F.col("year") == 2021)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "year" in plan


def test_stats_pruning_conservative_on_nulls(spark, tmp_path):
    path = str(tmp_path / "nulltbl")
    df = spark.createDataFrame(
        [(None, 1.0), (5, 2.0), (9, 3.0)], "id int, v double"
    ).coalesce(1)
    write_delta(df, path, partition_by=[])
    snap = DeltaLog(path).snapshot()
    # min/max don't cover nulls; != and range preds must keep the file
    assert len(prune_files(snap, [("id", "!=", 5)])) == 1
    assert len(prune_files(snap, [("id", "<=", 9)])) == 1
    assert len(prune_files(snap, [("id", ">", 9)])) == 0


def test_where_string_api(spark, part_tbl):
    """to_df(where=<SQL string>) applies exact row semantics AND file
    pruning from parseable conjuncts (unparseable ones are skipped —
    pruning is an optimization, the row filter supplies exactness)."""
    from athena_delta_lake_spark.delta.table import _parse_where

    t = DeltaTable(spark, part_tbl)
    tuple_n = t.to_df(where=[("year", "=", 2021)]).count()
    assert t.to_df(where="year = 2021").count() == tuple_n
    assert (
        t.to_df(where="year = 2021 AND month <= 2").count()
        == t.to_df(where=[("year", "=", 2021), ("month", "<=", 2)]).count()
    )
    # OR disables pruning but stays exact
    both = t.to_df(where="year = 2020 OR year = 2021").count()
    assert both == t.to_df().filter("year in (2020, 2021)").count()
    # parser: literals, quote escapes, <>, skip-on-function
    assert _parse_where("a = 'it''s' AND b <> 2 AND upper(c) = 'X'") == [
        ("a", "=", "it's"),
        ("b", "!=", 2),
    ]
    assert _parse_where("a = 1 OR b = 2") == []


def test_metadata_count_never_reads_data(spark, tmp_path):
    """count() with partition-only predicates is answered from the log:
    proven by deleting every data file from disk — the count still comes
    back right, because nothing ever scans."""
    import os
    import shutil

    from athena_delta_lake_spark.delta import DeltaTable, write_delta
    from athena_delta_lake_spark.delta.dml import delete_mor

    path = str(tmp_path / "meta_count")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(90)], "id long, part int, v double"
    ).coalesce(1)
    write_delta(df, path, partition_by=["part"])
    delete_mor(spark, path, where="id = 5")  # DV cardinality subtracted
    t = DeltaTable(spark, path)
    assert t.count() == 89
    assert t.count(where="part = 0") == 30
    assert t.count(where="part = 2") == 29  # id=5 (part 2) is DV-deleted
    assert t.count(where=[("part", "in", [0, 1])]) == 60
    # destroy the data files; metadata counting must not notice
    for root, dirs, names in os.walk(path):
        if "_delta_log" in root:
            continue
        for n in names:
            if n.endswith(".parquet"):
                os.remove(os.path.join(root, n))
    shutil.rmtree(os.path.join(path, "part=0"), ignore_errors=True)
    assert t.count() == 89
    assert t.count(where="part = 1") == 30


def test_metadata_minmax_never_reads_data(spark, tmp_path):
    import os

    from athena_delta_lake_spark.delta import DeltaTable, write_delta
    from athena_delta_lake_spark.delta.dml import delete_mor

    path = str(tmp_path / "meta_minmax")
    df = spark.createDataFrame(
        [(i, i % 3, float(i) * 1.5) for i in range(90)],
        "id long, part int, v double",
    ).coalesce(1)
    write_delta(df, path, partition_by=["part"])
    t = DeltaTable(spark, path)
    # destroy the data files: stats answers must not notice
    for root, _d, names in os.walk(path):
        if "_delta_log" in root:
            continue
        for n in names:
            if n.endswith(".parquet"):
                os.remove(os.path.join(root, n))
    assert t.min_max("v") == (0.0, 89 * 1.5)
    assert t.min_max("part") == (0, 2)
    assert t.min_max("v", where="part = 1") == (1.5, 88 * 1.5)
    assert t.min_max("id", where=[("part", "in", [0, 2])]) == (0, 89)


def test_metadata_minmax_dv_falls_back_to_scan(spark, tmp_path):
    from athena_delta_lake_spark.delta import DeltaTable, write_delta
    from athena_delta_lake_spark.delta.dml import delete_mor

    path = str(tmp_path / "minmax_dv")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "id long, v double"
    ).coalesce(1)
    write_delta(df, path)
    delete_mor(spark, path, where="id = 39")  # the max row, via DV
    t = DeltaTable(spark, path)
    # stats still say max=39; the DV forces a scan and the truth is 38
    assert t.min_max("v") == (0.0, 38.0)
    # partition-free string column: scan path
    assert t.min_max("id") == (0, 38)
