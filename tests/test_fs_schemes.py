"""Filesystem-facade tests: the Hadoop-FS path (used for s3a://, gs://,
abfs://, hdfs://) driven through file:// URIs, which Hadoop's
LocalFileSystem serves — proving log replay, catalog discovery, scan and
time travel work through the JVM connector path, not just os.listdir."""

import os

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


# --------------------------------------------------------- write path (r7)
# Every mutator routed through the JVM Hadoop connector (forced onto
# file:// by ADLS_FORCE_HADOOP_FS) — the code path hdfs:// / abfss:// /
# s3a:// take in production, where rounds 1-6 were read-only.


@pytest.fixture
def hadoop_write(monkeypatch):
    monkeypatch.setenv("ADLS_FORCE_HADOOP_FS", "1")
    DeltaLog.clear_cache()
    yield
    DeltaLog.clear_cache()


def test_facade_write_primitives(spark, tmp_path, hadoop_write):
    fs = get_fs(str(tmp_path), spark)
    assert isinstance(fs, HadoopFS)
    d = str(tmp_path / "a" / "b")
    fs.mkdirs(d)
    assert fs.is_dir(d)
    fs.create_atomic(d + "/x.txt", b"hello")
    assert fs.read_text(d + "/x.txt") == "hello"
    with pytest.raises(FileExistsError):
        fs.create_atomic(d + "/x.txt", b"again")  # put-if-absent holds
    fs.write_bytes(d + "/x.txt", b"rewritten")
    assert fs.read_bytes(d + "/x.txt") == b"rewritten"
    fs.copy(d + "/x.txt", d + "/y.txt")
    fs.move(d + "/y.txt", d + "/z.txt")
    walked = {(r, s) for r, s, _m in fs.walk_files(str(tmp_path / "a"))}
    assert walked == {("b/x.txt", 9), ("b/z.txt", 9)}
    fs.delete(d + "/z.txt")
    assert not fs.exists(d + "/z.txt")
    fs.delete(str(tmp_path / "a"), recursive=True)
    assert not fs.exists(str(tmp_path / "a"))


def test_full_mutator_cycle_via_hadoop_fs(spark, tmp_path, hadoop_write):
    """write -> MOR delete (DV blob) -> COW update -> append -> checkpoint
    -> OPTIMIZE -> VACUUM, all through file:// + HadoopFS; contents and
    time travel verified at each step."""
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    uri = "file://" + str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(200)], "id long, p int, v double"
    ).repartition(4)
    write_delta(df, uri, partition_by=["p"])  # v0
    t = DeltaTable(spark, uri)
    assert t.to_df().count() == 200

    res = t.delete(where="id % 10 = 0", mode="mor")  # v1: DV blobs
    assert res["rows_deleted"] == 20
    assert t.to_df().count() == 180
    assert any(f.deletion_vector for f in t.snapshot().files)

    t.update(set={"v": "v + 1000"}, where="id = 7", mode="cow")  # v2
    assert t.to_df().filter("id = 7").first()["v"] == 1007.0

    write_delta(  # v3: append
        spark.createDataFrame([(1000 + i, i % 4, 0.0) for i in range(8)],
                              "id long, p int, v double"),
        uri,
    )
    assert t.to_df().count() == 188

    write_checkpoint(uri)
    DeltaLog.clear_cache()
    assert t.to_df().count() == 188  # checkpoint replay through facade
    assert t.to_df(version=0).count() == 200  # time travel intact

    t.compact()  # OPTIMIZE purges DVs
    assert all(f.deletion_vector is None for f in t.snapshot().files)
    reaped = t.vacuum(retention_hours=0.0)
    assert any(f.endswith(".parquet") for f in reaped["files"])
    assert any("deletion_vector_" in f for f in reaped["files"])
    assert t.to_df().count() == 188
    # vacuumed files are really gone from storage
    fs = get_fs(uri, spark)
    on_disk = {r for r, _s, _m in fs.walk_files(uri) if not r.startswith("_delta_log")}
    live = {f.path for f in t.snapshot().files}
    assert on_disk == live


def test_commit_conflict_via_hadoop_fs(spark, tmp_path, hadoop_write):
    """The put-if-absent primitive holds through the Hadoop path: a
    racing commit at the same version raises FileExistsError (OCC loser
    retries)."""
    from athena_delta_lake_spark.delta.writer import _atomic_commit

    uri = "file://" + str(tmp_path / "tbl")
    write_delta(spark.range(10).selectExpr("id"), uri)
    log_dir = uri + "/_delta_log"
    _atomic_commit(log_dir, 1, [{"commitInfo": {"timestamp": 0}}])
    with pytest.raises(FileExistsError):
        _atomic_commit(log_dir, 1, [{"commitInfo": {"timestamp": 1}}])


def test_sql_dml_and_maintenance_via_hadoop_fs(spark, tmp_path, hadoop_write):
    """The pond SQL surface (CTAS, UPDATE, DELETE, MERGE, OPTIMIZE,
    VACUUM, DESCRIBE HISTORY) against a file:// pond root on the Hadoop
    path."""
    from athena_delta_lake_spark.catalog import DeltaPond

    root = "file://" + str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    spark.range(100).selectExpr("id", "id % 5 as k").createOrReplaceTempView(
        "hfs_src"
    )
    pond.sql("CREATE TABLE lake.t AS SELECT * FROM hfs_src")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 100
    pond.sql("UPDATE lake.t SET k = k + 10 WHERE id < 10")
    pond.sql("DELETE FROM lake.t WHERE id >= 90")
    pond.sql(
        "MERGE INTO lake.t USING (SELECT CAST(5 AS BIGINT) AS id, "
        "CAST(99 AS BIGINT) AS k) s ON lake.t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert pond.sql("SELECT k FROM lake.t WHERE id = 5").first()["k"] == 99
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 90
    pond.sql("CALL optimize('lake.t')")
    pond.sql("CALL vacuum('lake.t', 0.0)")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 90
    ops = [r["operation"] for r in pond.sql("DESCRIBE HISTORY lake.t").collect()]
    assert "OPTIMIZE" in ops and "MERGE" in ops
    # Regression (round-10 verdict #1): the CREATE routes used to
    # os.makedirs the raw URI path, littering the driver CWD with a
    # literal `./file:/…` tree. The mkdir now goes through the fs facade;
    # the CWD must stay clean.
    assert not os.path.exists("file:"), (
        "SQL CREATE against a URI pond root littered the CWD with a "
        "relative 'file:' directory tree"
    )
    # …and the delete/move half of the same class (round-11 review):
    # RENAME, DROP TABLE and DROP SCHEMA must work on the URI root too
    # (raw shutil.rmtree/move made URI tables creatable but undroppable)
    pond.sql("ALTER TABLE lake.t RENAME TO lake.t2")
    assert pond.sql("SELECT count(*) AS n FROM lake.t2").first()["n"] == 90
    pond.sql("DROP TABLE lake.t2")
    assert "t2" not in pond.list_tables("lake")
    pond.sql("DROP SCHEMA lake CASCADE")
    assert "lake" not in pond.list_schemas()
    assert not os.path.exists("file:")


def test_restore_via_uri_path(spark, tmp_path, hadoop_write):
    """RESTORE on a file:// table path: the vacuumed-file existence check
    used raw os.path.exists on the URI-joined path, which is always False
    — every URI-path restore falsely refused as 'vacuumed' (round-11
    review sweep). Facade probe now; restore must succeed and rewind."""
    path = "file://" + str(tmp_path / "r")
    write_delta(spark.range(40).selectExpr("id", "id % 4 as k"), path)
    write_delta(
        spark.range(40, 60).selectExpr("id", "id % 4 as k"),
        path,
        mode="append",
    )
    t = DeltaTable(spark, path)
    assert t.to_df().count() == 60
    t.restore(version=0)
    assert DeltaTable(spark, path).to_df().count() == 40


def test_clone_and_convert_via_hadoop_fs(spark, tmp_path, hadoop_write):
    from athena_delta_lake_spark.delta.writer import clone_table, convert_to_delta

    src = "file://" + str(tmp_path / "src")
    write_delta(spark.range(50).selectExpr("id", "id % 2 as p"), src,
                partition_by=["p"])
    # deep clone copies bytes through the facade
    deep = "file://" + str(tmp_path / "deep")
    clone_table(src, deep, shallow=False)
    assert DeltaTable(spark, deep).to_df().count() == 50
    # shallow clone references the source absolutely
    shal = "file://" + str(tmp_path / "shal")
    clone_table(src, shal, shallow=True)
    assert DeltaTable(spark, shal).to_df().count() == 50
    # convert an existing parquet dir in place, via URI
    plain = str(tmp_path / "plain")
    spark.range(30).selectExpr("id", "id % 3 as g").write.partitionBy(
        "g"
    ).parquet(plain)
    convert_to_delta(spark, "file://" + plain)
    t = DeltaTable(spark, "file://" + plain)
    assert t.to_df().count() == 30
    assert t.snapshot().partition_columns == ["g"]
    # converted stats are real (Spark-job path): skipping can prune
    assert all(
        f.stats and f.stats.get("numRecords") for f in t.snapshot().files
    )


def test_log_compaction_and_cleanup_via_hadoop_fs(spark, tmp_path, hadoop_write):
    from athena_delta_lake_spark.delta.writer import (
        cleanup_log,
        compact_log,
        write_checkpoint,
    )

    uri = "file://" + str(tmp_path / "tbl")
    for i in range(4):
        write_delta(spark.range(i * 10, (i + 1) * 10).selectExpr("id"), uri)
    out = compact_log(uri, 0, 3)
    assert out.endswith(".compacted.json")
    t = DeltaTable(spark, uri)
    assert t.to_df().count() == 40
    write_checkpoint(uri)
    res = cleanup_log(uri, retention_hours=0.0)
    assert res["checkpoint"] == 3
    DeltaLog.clear_cache()
    assert DeltaTable(spark, uri).to_df().count() == 40


def test_create_atomic_never_overwrites_via_hadoop_fs(spark, tmp_path, hadoop_write):
    """Second-review finding: FileSystem.rename on RawLocalFileSystem is
    POSIX rename(2) and silently REPLACES — the commit primitive must use
    FileContext rename with Options.Rename.NONE so the OCC loser fails
    AND the winner's bytes survive."""
    fs = get_fs(str(tmp_path), spark)
    target = str(tmp_path / "c" / "00000000000000000001.json")
    fs.mkdirs(str(tmp_path / "c"))
    fs.create_atomic(target, b"winner")
    with pytest.raises(FileExistsError):
        fs.create_atomic(target, b"loser")
    assert fs.read_bytes(target) == b"winner"  # never clobbered
    # no temp litter left behind by the losing attempt
    leftovers = [r for r, _s, _m in fs.walk_files(str(tmp_path / "c"))]
    assert leftovers == ["00000000000000000001.json"]


# ---------------------------------------------------------------- round 8:
# commit-capability probe + pluggable conditional-PUT + non-atomic policy


def test_atomic_put_capability_matrix(monkeypatch):
    from athena_delta_lake_spark.delta import fs as fsm

    assert fsm.atomic_put_capability("/tmp/x") == "native-exclusive"
    assert fsm.atomic_put_capability("file:///tmp/x") == "native-exclusive"
    assert fsm.atomic_put_capability("hdfs://nn/x") == "atomic-rename"
    assert fsm.atomic_put_capability("viewfs://ns/x") == "atomic-rename"
    assert fsm.atomic_put_capability("abfss://c@a.dfs/x") == "atomic-rename"
    # forced-Hadoop file:// still renames atomically (LocalFileSystem)
    monkeypatch.setenv("ADLS_FORCE_HADOOP_FS", "1")
    assert fsm.atomic_put_capability("file:///tmp/x") == "atomic-rename"
    monkeypatch.delenv("ADLS_FORCE_HADOOP_FS")
    # s3: non-atomic-rename by default; conditional-put only once the
    # boto3 hook is OPT-IN registered (ADLS_S3_CONDITIONAL_PUT=1 — never
    # on mere importability, since boto3's endpoint/credential chain need
    # not match the cluster's fs.s3a.* config)
    monkeypatch.setattr(fsm, "_PUT_IF_ABSENT", {})
    assert fsm.atomic_put_capability("s3a://b/k") == "non-atomic-rename"
    assert fsm.atomic_put_capability("gs://b/k") == "non-atomic-rename"
    monkeypatch.setenv("ADLS_S3_CONDITIONAL_PUT", "1")
    fsm._maybe_register_s3_hook()
    assert fsm.atomic_put_capability("s3a://b/k") == "conditional-put"
    assert fsm.atomic_put_capability("s3://b/k") == "conditional-put"
    assert fsm.atomic_put_capability("gs://b/k") == "non-atomic-rename"


def test_registered_hook_serves_create_atomic(spark, monkeypatch):
    """create_atomic dispatches to the registered put-if-absent for the
    scheme BEFORE touching any Hadoop connector — a second put of the
    same path surfaces FileExistsError (the OCC loser signal)."""
    from athena_delta_lake_spark.delta import fs as fsm

    store: dict[str, bytes] = {}

    def fake_put(path, data):
        if path in store:
            raise FileExistsError(path)
        store[path] = data

    monkeypatch.setattr(fsm, "_PUT_IF_ABSENT", {"mock": fake_put})
    h = fsm.HadoopFS(spark)
    h.create_atomic("mock://bucket/t/_delta_log/0.json", b"v0")
    assert store["mock://bucket/t/_delta_log/0.json"] == b"v0"
    with pytest.raises(FileExistsError):
        h.create_atomic("mock://bucket/t/_delta_log/0.json", b"again")


def test_nonatomic_commit_policy(monkeypatch):
    from athena_delta_lake_spark.delta import fs as fsm

    monkeypatch.setattr(fsm, "_WARNED_SCHEMES", set())
    monkeypatch.setenv("ADLS_NONATOMIC_COMMIT", "refuse")
    with pytest.raises(OSError, match="NON-ATOMIC"):
        fsm._nonatomic_commit_policy("s3a://b/t/_delta_log/5.json")
    monkeypatch.setenv("ADLS_NONATOMIC_COMMIT", "warn")
    with pytest.warns(UserWarning, match="NON-ATOMIC"):
        fsm._nonatomic_commit_policy("s3a://b/t/_delta_log/5.json")
    # once per scheme only
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        fsm._nonatomic_commit_policy("s3a://b/t/_delta_log/6.json")
    monkeypatch.setenv("ADLS_NONATOMIC_COMMIT", "allow")
    monkeypatch.setattr(fsm, "_WARNED_SCHEMES", set())
    fsm._nonatomic_commit_policy("s3a://b/t/_delta_log/7.json")  # no-op


def test_s3_conditional_put_maps_412(monkeypatch):
    """The boto3-backed S3 hook translates PreconditionFailed (the
    If-None-Match loser) into FileExistsError — exercised against a
    stubbed S3 client, no network."""
    boto3 = pytest.importorskip("boto3")
    from botocore.stub import Stubber

    from athena_delta_lake_spark.delta import fs as fsm

    client = boto3.client("s3", region_name="us-east-1")
    stub = Stubber(client)
    stub.add_client_error(
        "put_object", service_error_code="PreconditionFailed",
        http_status_code=412,
    )
    # 409 ConditionalRequestConflict: a RACING conditional PUT — must
    # also surface as FileExistsError so the OCC loop retries instead of
    # aborting the DML with a raw S3 error
    stub.add_client_error(
        "put_object", service_error_code="ConditionalRequestConflict",
        http_status_code=409,
    )
    stub.activate()
    monkeypatch.setattr(boto3, "client", lambda *_a, **_k: client)
    with pytest.raises(FileExistsError):
        fsm._s3_put_if_absent("s3a://bucket/t/_delta_log/3.json", b"x")
    with pytest.raises(FileExistsError):
        fsm._s3_put_if_absent("s3a://bucket/t/_delta_log/3.json", b"x")
    stub.deactivate()


def test_remote_vacuum_fanout_via_hadoop_fs(spark, tmp_path, hadoop_write, monkeypatch):
    """The remote-scheme light-VACUUM branch against the REAL JVM facade
    (ADLS_FORCE_HADOOP_FS): spool staged into _delta_log/.tmp via
    HadoopFS.write_bytes, doomed list streamed back, deletes issued from
    a 16-thread driver pool through py4j — the concurrency pattern an
    s3a:// deployment runs. Results must equal a classic reap on a twin."""
    import shutil

    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.delta import dml
    from athena_delta_lake_spark.delta import fs as fsmod
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    def mk(path):
        df = spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(200)],
            "id long, part int, v double",
        )
        write_delta(df.coalesce(1), path, partition_by=["part"])
        write_delta(
            df.coalesce(1), path, mode="overwrite", partition_by=["part"]
        )
        DeltaTable(spark, path).delete(where="id % 50 = 0")
        write_checkpoint(path)
        DeltaLog.clear_cache()

    a, b = str(tmp_path / "hv_a"), str(tmp_path / "hv_b")
    mk(a)
    shutil.copytree(a, b)
    DeltaLog.clear_cache()
    want = sorted(
        tuple(r) for r in DeltaTable(spark, a).to_df().collect()
    )
    res_c = dml.vacuum(a, retention_hours=0)
    assert res_c["files"]

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setattr(fsmod, "executor_fs_safe", lambda p: False)
    res_l = dml.vacuum(b, retention_hours=0, spark=spark)
    assert res_l["planning"] == "light"
    assert res_l["files"] == res_c["files"]
    import os as _os

    for rel in res_l["files"]:
        assert not _os.path.exists(_os.path.join(b, rel))
    DeltaLog.clear_cache()
    got = sorted(tuple(r) for r in DeltaTable(spark, b).to_df().collect())
    assert got == want


def test_staged_checkpoint_via_hadoop_fs(spark, tmp_path, hadoop_write, monkeypatch):
    """The remote-scheme staged checkpoint against the REAL JVM facade:
    Spark's native writer lands the parts, then HadoopFS listdir + move
    rename them into checkpoint names — replay must equal classic."""
    import shutil

    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.delta import fs as fsmod
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    def mk(path):
        df = spark.createDataFrame(
            [(i, i % 8, float(i)) for i in range(400)],
            "id long, part int, v double",
        )
        write_delta(df, path, partition_by=["part"])
        write_checkpoint(path)
        write_delta(
            spark.createDataFrame(
                [(1000, 0, -1.0)], "id long, part int, v double"
            ),
            path,
            mode="append",
        )
        DeltaLog.clear_cache()

    a, b = str(tmp_path / "hc_a"), str(tmp_path / "hc_b")
    mk(a)
    shutil.copytree(a, b)
    DeltaLog.clear_cache()
    v_c = write_checkpoint(a, parts=3)

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setattr(fsmod, "executor_fs_safe", lambda p: False)
    v_l = write_checkpoint(b, parts=3, spark=spark)
    assert v_l == v_c
    DeltaLog.clear_cache()

    sa, sb = DeltaLog(a).snapshot(), DeltaLog(b).snapshot()
    fa = {f.path: (f.size, f.stats) for f in sa.files}
    fb = {f.path: (f.size, f.stats) for f in sb.files}
    assert fa == fb
    assert sorted(
        tuple(r) for r in DeltaTable(spark, a).to_df().collect()
    ) == sorted(tuple(r) for r in DeltaTable(spark, b).to_df().collect())
