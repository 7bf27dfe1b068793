"""Filesystem-facade tests: the Hadoop-FS path (used for s3a://, gs://,
abfs://, hdfs://) driven through file:// URIs, which Hadoop's
LocalFileSystem serves — proving log replay, catalog discovery, scan and
time travel work through the JVM connector path, not just os.listdir."""

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaPond, DeltaTable, write_delta
from athena_delta_lake_spark.delta.fs import HadoopFS, LocalFS, get_fs
from athena_delta_lake_spark.delta.log import DeltaLog


def test_get_fs_dispatch(spark):
    assert isinstance(get_fs("/tmp/x"), LocalFS)
    assert isinstance(get_fs("file:///tmp/x"), LocalFS)
    assert isinstance(get_fs("hdfs://nn/x", spark), HadoopFS)


@pytest.fixture
def delta_uri(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("p"), (F.col("id") * 0.5).alias("v")
    )
    write_delta(df, path, partition_by=["p"])
    write_delta(
        spark.range(100, 120).select(
            F.col("id"), (F.col("id") % 4).alias("p"), (F.col("id") * 0.5).alias("v")
        ),
        path,
    )
    return "file://" + path


def test_log_replay_via_hadoop_fs(spark, delta_uri):
    fs = HadoopFS(spark)
    # force the Hadoop implementation (file:// would normally take LocalFS)
    log = DeltaLog.__new__(DeltaLog)
    log.table_path = delta_uri
    log.log_dir = delta_uri + "/_delta_log"
    log._fs = fs
    DeltaLog.clear_cache()
    snap = log.snapshot()
    assert snap.version == 1
    assert snap.partition_columns == ["p"]
    assert sum(f.stats["numRecords"] for f in snap.files) == 120

    v0 = log.snapshot(0)
    assert sum(f.stats["numRecords"] for f in v0.files) == 100


def test_scan_through_uri(spark, delta_uri):
    DeltaLog.clear_cache()
    t = DeltaTable(spark, delta_uri)
    assert t.to_df().count() == 120
    assert t.to_df(version=0).count() == 100
    assert t.to_df(predicates=[("p", "=", 2)]).filter(F.col("p") == 2).count() == 30
    assert [h["version"] for h in t.history()] == [1, 0]


def test_catalog_through_uri(spark, tmp_path):
    root = tmp_path / "lake"
    (root / "db").mkdir(parents=True)
    write_delta(
        spark.range(10).select(F.col("id")), str(root / "db" / "t1"), partition_by=[]
    )
    pond = DeltaPond(spark, "file://" + str(root))
    assert pond.list_schemas() == ["db"]
    assert pond.list_tables("db") == ["t1"]
    assert pond.read("db", "t1").count() == 10


def test_hadoop_checkpoint_replay(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "cp_tbl")
    write_delta(spark.range(50).select(F.col("id")), path, partition_by=[])
    write_checkpoint(path)
    write_delta(spark.range(50, 60).select(F.col("id")), path)

    fs = HadoopFS(spark)
    log = DeltaLog.__new__(DeltaLog)
    log.table_path = "file://" + path
    log.log_dir = "file://" + path + "/_delta_log"
    log._fs = fs
    DeltaLog.clear_cache()
    snap = log.snapshot()
    assert sum(f.stats["numRecords"] for f in snap.files) == 60
