"""Write-path extensions: CONVERT TO DELTA (in-place log over existing
parquet), schema evolution on append (merge_schema), and clustered writes
(cluster_by -> range-partitioned files whose min/max stats prune)."""

import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta import prune_files
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import convert_to_delta


def test_convert_to_delta_partitioned(spark, tmp_path):
    path = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(300)], "id int, p int, v double"
    )
    df.write.partitionBy("p").parquet(path)
    convert_to_delta(spark, path)  # auto-detects hive partition col
    t = DeltaTable(spark, path)
    assert t.partition_columns() == ["p"]
    assert t.to_df().count() == 300
    # typed partition column (int, not string) via Spark discovery
    assert t.schema()["p"].dataType.simpleString() == "int"
    # stats were computed in place: data-skipping prunes on id
    snap = t.snapshot()
    assert len(prune_files(snap, [("id", ">", 10_000)])) == 0
    # pruning on the partition value works from path-derived partitionValues
    n_p0 = len(prune_files(snap, [("p", "=", 0)]))
    assert 0 < n_p0 < len(snap.files)
    # no data was moved: original spark files still there, no staging copies
    assert t.history()[0]["operation"] == "CONVERT"


def test_convert_refuses_existing_delta(spark, tmp_path):
    path = str(tmp_path / "already")
    write_delta(spark.range(5), path, partition_by=[])
    with pytest.raises(ValueError, match="already a Delta"):
        convert_to_delta(spark, path)


def test_schema_evolution_append(spark, tmp_path):
    path = str(tmp_path / "evolve")
    v1 = spark.createDataFrame([(1, "a")], "id int, s string")
    write_delta(v1, path, partition_by=[])
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id int, s string, score double")
    # without the flag: explicit error
    with pytest.raises(ValueError, match="merge_schema"):
        write_delta(v2, path)
    write_delta(v2, path, merge_schema=True)
    t = DeltaTable(spark, path)
    assert [f.name for f in t.schema().fields] == ["id", "s", "score"]
    rows = {r.id: r for r in t.to_df().collect()}
    assert rows[1].score is None  # old file reads NULL for the new column
    assert rows[2].score == 9.5
    # narrower frame appends fine after evolution (missing col -> NULL)
    v3 = spark.createDataFrame([(3, "c")], "id int, s string")
    write_delta(v3, path, merge_schema=True)
    assert t.to_df(version=None).count() == 3
    # type change is still rejected
    bad = spark.createDataFrame([(4, 5)], "id int, s int")
    with pytest.raises(ValueError, match="type change"):
        write_delta(bad, path, merge_schema=True)


def test_cluster_by_improves_skipping(spark, tmp_path):
    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    # ids shuffled across input partitions: without clustering every file
    # spans nearly the full id range
    df = (
        spark.range(0, 40_000)
        .withColumn("id", F.xxhash64("id") % 40_000)
        .repartition(8)
    )
    write_delta(df, scattered, partition_by=[])
    write_delta(df, clustered, partition_by=[], cluster_by=["id"])

    pred = [("id", ">=", 0), ("id", "<", 1000)]
    snap_s = DeltaLog(scattered).snapshot()
    snap_c = DeltaLog(clustered).snapshot()
    kept_s = len(prune_files(snap_s, pred))
    kept_c = len(prune_files(snap_c, pred))
    assert len(snap_c.files) > 1
    assert kept_c < kept_s  # clustering makes min/max ranges disjoint
    assert kept_c <= 2
    # same data either way
    sc = DeltaTable(spark, scattered).to_df()
    cl = DeltaTable(spark, clustered).to_df()
    assert sc.count() == cl.count()
    assert sc.agg(F.sum("id")).collect() == cl.agg(F.sum("id")).collect()


# ----------------------------------------------------- CHECK constraints


def test_check_constraint_lifecycle(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import (
        add_check_constraint,
        drop_check_constraint,
    )

    path = str(tmp_path / "chk")
    write_delta(
        spark.range(10).selectExpr("id", "cast(id as double) as v"), path
    )
    add_check_constraint(spark, path, "v_nonneg", "v >= 0")
    # violating append rejected BEFORE any commit
    v_before = DeltaTable(spark, path).version()
    with pytest.raises(ValueError, match="v_nonneg"):
        write_delta(
            spark.range(3).selectExpr("id", "cast(-1 as double) as v"), path
        )
    assert DeltaTable(spark, path).version() == v_before
    # passing append fine; NULL passes (SQL CHECK semantics)
    write_delta(
        spark.range(3).selectExpr("id", "cast(null as double) as v"), path
    )
    # UPDATE that would violate is rejected
    from athena_delta_lake_spark.delta.dml import update

    with pytest.raises(ValueError, match="v_nonneg"):
        update(spark, path, {"v": "-5.0"}, "id = 1")
    # constraint survives overwrite
    write_delta(
        spark.range(5).selectExpr("id", "cast(id as double) as v"),
        path,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="v_nonneg"):
        write_delta(
            spark.range(1).selectExpr("id", "cast(-2 as double) as v"), path
        )
    # drop -> violating write now allowed
    drop_check_constraint(path, "v_nonneg")
    write_delta(
        spark.range(1).selectExpr("id", "cast(-2 as double) as v"), path
    )


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import add_check_constraint

    path = str(tmp_path / "chk2")
    write_delta(spark.range(5).selectExpr("id - 3 as x"), path)
    with pytest.raises(ValueError, match="x_pos"):
        add_check_constraint(spark, path, "x_pos", "x > 0")


# ------------------------------------------- optimistic concurrency (OCC)


def _steal_next_version(spark, path):
    """Simulate a concurrent writer: commit a no-op-ish append at the
    version the next transaction will target."""
    write_delta(spark.range(1).selectExpr("id", "cast(id as double) as v"), path)


def test_append_retries_past_concurrent_append(spark, tmp_path, monkeypatch):
    import athena_delta_lake_spark.delta.writer as W

    path = str(tmp_path / "occ")
    write_delta(spark.range(5).selectExpr("id", "cast(id as double) as v"), path)

    real_commit = W._atomic_commit
    raced = {"done": False}

    def racing_commit(log_dir, version, actions):
        if not raced["done"]:
            raced["done"] = True
            _steal_next_version(spark, path)  # winner takes `version`
        return real_commit(log_dir, version, actions)

    monkeypatch.setattr(W, "_atomic_commit", racing_commit)
    v = write_delta(
        spark.range(10, 13).selectExpr("id", "cast(id as double) as v"), path
    )
    monkeypatch.undo()
    assert v == 2  # lost v1 to the racer, retried and landed at v2
    from athena_delta_lake_spark import DeltaTable

    assert DeltaTable(spark, path).to_df().count() == 9  # 5 + 1 + 3


def test_rewrite_conflict_on_same_files_raises(spark, tmp_path, monkeypatch):
    import athena_delta_lake_spark.delta.writer as W
    from athena_delta_lake_spark.delta.dml import delete
    from athena_delta_lake_spark.delta.writer import ConcurrentWriteError

    path = str(tmp_path / "occ2")
    write_delta(
        spark.range(20).selectExpr("id", "cast(id as double) as v"), path
    )

    real_commit = W._atomic_commit
    raced = {"done": False}

    def racing_commit(log_dir, version, actions):
        if not raced["done"] and any("remove" in a for a in actions):
            raced["done"] = True
            # competing transaction rewrites THE SAME file first
            monkeypatch.setattr(W, "_atomic_commit", real_commit)
            delete(spark, path, "id = 1")
            monkeypatch.setattr(W, "_atomic_commit", racing_commit)
        return real_commit(log_dir, version, actions)

    monkeypatch.setattr(W, "_atomic_commit", racing_commit)
    with pytest.raises(ConcurrentWriteError, match="same files"):
        delete(spark, path, "id = 0")
    monkeypatch.undo()


def test_generated_columns(spark, tmp_path):
    """delta.generationExpression: computed when absent, verified when
    provided, preserved in the log schema, partition-usable."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    path = str(tmp_path / "gen_tbl")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
            T.StructField(
                "event_date",
                T.DateType(),
                metadata={"delta.generationExpression": "CAST(ts AS DATE)"},
            ),
        ]
    )
    base = spark.createDataFrame(
        [("2024-03-01 10:00:00", 1), ("2024-03-02 23:59:59", 2)],
        "ts string, v long",
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    first = base.withColumn("event_date", F.to_date("ts"))
    df0 = spark.createDataFrame(first.collect(), schema)
    write_delta(df0, path, partition_by=["event_date"])
    t = DeltaTable(spark, path)
    # expression survives in the log schema; writer version bumped
    assert (
        t.schema()["event_date"].metadata["delta.generationExpression"]
        == "CAST(ts AS DATE)"
    )
    assert t.snapshot().protocol["minWriterVersion"] == 4

    # append WITHOUT the generated column: computed automatically
    more = spark.createDataFrame([("2024-03-03 00:00:01", 3)], "ts string, v long")
    more = more.select(F.to_timestamp("ts").alias("ts"), "v")
    write_delta(more, path)
    got = {(str(r["event_date"]), r["v"]) for r in t.to_df().collect()}
    assert got == {("2024-03-01", 1), ("2024-03-02", 2), ("2024-03-03", 3)}

    # append with a WRONG provided value: rejected
    bad = spark.createDataFrame(
        [("2024-03-04 08:00:00", 4, "1999-01-01")],
        "ts string, v long, event_date string",
    ).select(
        F.to_timestamp("ts").alias("ts"), "v", F.to_date("event_date").alias("event_date")
    )
    with pytest.raises(ValueError, match="generated column 'event_date'"):
        write_delta(bad, path)


def test_zorder_prunes_on_every_dimension(spark, tmp_path):
    """Z-order clustering by (a, b): min/max stats prune files for
    predicates on EITHER column; lexicographic cluster_by=[a] only helps
    its leading column."""
    from athena_delta_lake_spark.delta import DeltaTable

    n = 40_000
    df = spark.range(n).selectExpr(
        "CAST(id % 200 AS BIGINT) AS a",
        "CAST(CAST(id / 200 AS BIGINT) % 200 AS BIGINT) AS b",
        "id AS payload",
    ).repartition(16)

    zpath = str(tmp_path / "z_tbl")
    write_delta(df, zpath, zorder_by=["a", "b"])
    zt = DeltaTable(spark, zpath)
    z_total = len(zt.snapshot().files)
    assert z_total >= 8
    za = len(zt.pruned_files([("a", "=", 5)]))
    zb = len(zt.pruned_files([("b", "=", 5)]))
    assert za < z_total / 2 and zb < z_total / 2  # both dims prune

    cpath = str(tmp_path / "c_tbl")
    write_delta(df, cpath, cluster_by=["a"])
    ct = DeltaTable(spark, cpath)
    c_total = len(ct.snapshot().files)
    cb = len(ct.pruned_files([("b", "=", 5)]))
    # lexicographic-on-a leaves b unclustered: no real pruning on b
    assert cb > 0.8 * c_total
    # correctness: z-ordered table reads back identically
    assert zt.to_df().count() == n
    assert zt.to_df().agg({"payload": "sum"}).first()[0] == n * (n - 1) // 2


def test_idempotent_txn_writes(spark, tmp_path):
    """SetTransaction idempotence: a retried (appId, version) append is a
    no-op; a newer version applies; state survives checkpoint replay."""
    from athena_delta_lake_spark.delta import DeltaTable
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "txn_tbl")
    df = spark.range(10).selectExpr("id")
    write_delta(df, path, txn_app_id="job-1", txn_version=1)
    # crashed-and-retried batch: same txn -> silently skipped
    write_delta(df, path, txn_app_id="job-1", txn_version=1)
    t = DeltaTable(spark, path)
    assert t.to_df().count() == 10 and t.version() == 0
    # next batch applies
    write_delta(spark.range(10, 15).selectExpr("id"), path,
                txn_app_id="job-1", txn_version=2)
    assert t.to_df().count() == 15
    assert t.snapshot().txns == {"job-1": 2}
    # survives checkpoint-based replay
    write_checkpoint(path)
    from athena_delta_lake_spark.delta.log import DeltaLog

    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot().txns == {"job-1": 2}
    write_delta(df, path, txn_app_id="job-1", txn_version=2)  # still no-op
    assert t.to_df().count() == 15


def test_log_cleanup_after_checkpoint(spark, tmp_path):
    from athena_delta_lake_spark.delta import DeltaTable
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import cleanup_log, write_checkpoint

    path = str(tmp_path / "clean_tbl")
    for i in range(4):
        write_delta(spark.range(i * 10, (i + 1) * 10).selectExpr("id"), path)
    write_checkpoint(path)  # checkpoint at v3
    write_delta(spark.range(40, 45).selectExpr("id"), path)  # v4

    # retention protects recent commits
    assert cleanup_log(path, retention_hours=1.0)["removed"] == []
    res = cleanup_log(path, retention_hours=0.0)
    assert res["checkpoint"] == 3
    assert len(res["removed"]) == 3  # v0..v2 (v3 is the checkpoint version)
    t = DeltaTable(spark, path)
    assert t.to_df().count() == 45  # checkpoint + v3 json + v4 replay fine
    with pytest.raises((FileNotFoundError, ValueError)):
        DeltaLog(path).snapshot(1)  # cleaned version is gone, cleanly


def test_multipart_checkpoint_roundtrip(spark, tmp_path):
    import os as _os

    from athena_delta_lake_spark.delta import DeltaTable
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "multi_cp")
    for i in range(3):
        write_delta(
            spark.range(i * 20, (i + 1) * 20).selectExpr("id", "id % 2 AS p"),
            path,
            partition_by=["p"],
        )
    v = write_checkpoint(path, parts=3)
    names = sorted(_os.listdir(_os.path.join(path, "_delta_log")))
    part_files = [n for n in names if ".checkpoint." in n and n.endswith(".parquet")]
    assert len(part_files) == 3
    # replay from the multi-part checkpoint only: delete pre-checkpoint JSONs
    for n in names:
        if n.endswith(".json") and int(n.split(".")[0]) < v:
            _os.remove(_os.path.join(path, "_delta_log", n))
    DeltaLog.clear_cache()
    t = DeltaTable(spark, path)
    assert t.count() == 60
    assert t.to_df().filter("p = 1").count() == 30


def test_in_commit_timestamps(spark, tmp_path):
    """inCommitTimestamp writer feature: monotonic commit timestamps in
    commitInfo, protocol upgrade, and mtime-immune timestamp time travel."""
    import json
    import os

    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "ict")
    write_delta(
        spark.range(5).selectExpr("id"),
        path,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    write_delta(spark.range(5, 10).selectExpr("id"), path, mode="append")
    DeltaTable(spark, path).delete(where="id = 7")  # DML path stamps too

    log = DeltaLog(path)
    snap = log.snapshot()
    assert snap.protocol["minWriterVersion"] == 7
    assert "inCommitTimestamp" in snap.protocol["writerFeatures"]
    icts = [log.commit_timestamp(v) for v in range(3)]
    assert icts[0] < icts[1] < icts[2]  # strictly monotonic

    # corrupt every commit file's mtime: ICT resolution must not care
    log_dir = os.path.join(path, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.utime(os.path.join(log_dir, f), (0, 0))
    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot_as_of_timestamp(icts[1]).version == 1
    assert DeltaLog(path).snapshot_as_of_timestamp(icts[2] + 10).version == 2
    ci0 = json.loads(
        open(os.path.join(log_dir, "00000000000000000000.json")).readline()
    )["commitInfo"]
    assert ci0["inCommitTimestamp"] == icts[0]


def test_ict_enabled_on_existing_table(spark, tmp_path):
    """Enabling ICT after creation records the enablement version/timestamp
    properties and upgrades the protocol in the same commit."""
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "ict2")
    write_delta(spark.range(3).selectExpr("id"), path)
    write_delta(
        spark.range(3, 6).selectExpr("id"),
        path,
        mode="append",
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    snap = DeltaLog(path).snapshot()
    cfg = snap.metadata["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == "1"
    assert "delta.inCommitTimestampEnablementTimestamp" in cfg
    assert snap.protocol["minWriterVersion"] == 7
    log = DeltaLog(path)
    assert log.commit_timestamp(1) > 0
    # pre-enablement commit resolves by mtime (no ICT recorded)
    import json, os
    lines = open(
        os.path.join(path, "_delta_log", "00000000000000000000.json")
    ).readlines()
    assert all(
        "inCommitTimestamp" not in json.loads(ln).get("commitInfo", {})
        for ln in lines if ln.strip()
    )


def test_append_only_enforcement(spark, tmp_path):
    import pytest

    from athena_delta_lake_spark.delta.writer import write_checkpoint  # noqa: F401

    path = str(tmp_path / "ao")
    write_delta(
        spark.range(10).selectExpr("id", "id % 2 AS k"),
        path,
        configuration={"delta.appendOnly": "true"},
    )
    # appends stay legal
    write_delta(spark.range(10, 20).selectExpr("id", "id % 2 AS k"), path, mode="append")
    t = DeltaTable(spark, path)
    with pytest.raises(ValueError, match="append-only"):
        t.delete(where="id = 3")
    with pytest.raises(ValueError, match="append-only"):
        t.update({"k": "k + 1"}, where="id = 3")
    with pytest.raises(ValueError, match="append-only"):
        write_delta(spark.range(5).selectExpr("id", "id % 2 AS k"), path, mode="overwrite")
    assert t.to_df().count() == 20
    # compaction never changes rows -> allowed despite appendOnly
    t.compact(target_file_size=1024 * 1024 * 1024)
    assert DeltaTable(spark, path).to_df().count() == 20


def test_auto_checkpoint_interval(spark, tmp_path):
    import os

    path = str(tmp_path / "ckint")
    write_delta(
        spark.range(3).selectExpr("id"),
        path,
        configuration={"delta.checkpointInterval": "2"},
    )
    for lo in (3, 6, 9, 12):
        write_delta(
            spark.range(lo, lo + 3).selectExpr("id"), path, mode="append"
        )
    log_dir = os.path.join(path, "_delta_log")
    cps = sorted(
        f for f in os.listdir(log_dir) if f.endswith(".checkpoint.parquet")
    )
    assert cps == [
        "00000000000000000002.checkpoint.parquet",
        "00000000000000000004.checkpoint.parquet",
    ]
    import json

    last = json.load(open(os.path.join(log_dir, "_last_checkpoint")))
    assert last["version"] == 4


def test_domain_metadata_and_detail(spark, tmp_path):
    """domainMetadata actions: last-writer-wins replay, removal, checkpoint
    round trip; DESCRIBE DETAIL surface."""
    import os

    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "dm")
    write_delta(spark.range(10).selectExpr("id", "id % 2 AS k"), path, partition_by=["k"])
    t = DeltaTable(spark, path)
    t.set_domain_metadata("delta.clustering", '{"cols":["id"]}')
    t.set_domain_metadata("myapp.owner", "team-a")
    t.set_domain_metadata("myapp.owner", "team-b")          # overwrite
    t.set_domain_metadata("delta.clustering", removed=True)  # drop

    snap = DeltaLog(path).snapshot()
    assert snap.domain_metadata == {"myapp.owner": "team-b"}

    d = DeltaTable(spark, path).detail()
    assert d["numFiles"] == snap.num_files
    assert d["partitionColumns"] == ["k"]
    assert d["sizeInBytes"] == sum(f.size for f in snap.files)
    assert d["domainMetadata"] == {"myapp.owner": "team-b"}
    assert d["version"] == 4

    # survives checkpoint replay (classic AND v2) with commits removed
    write_checkpoint(path)
    write_checkpoint(path, v2=True)
    log_dir = os.path.join(path, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    DeltaLog.clear_cache()
    assert DeltaLog(path).snapshot().domain_metadata == {"myapp.owner": "team-b"}


def test_alter_table_add_columns(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    path = str(tmp_path / "addcols")
    write_delta(spark.range(5).selectExpr("id", "CAST(id AS DOUBLE) AS v"), path)
    t = DeltaTable(spark, path)
    v = t.add_columns(T.StructType([
        T.StructField("tag", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]))
    assert v == 1  # metadata-only commit

    t = DeltaTable(spark, path)
    df = t.to_df()
    assert df.columns == ["id", "v", "tag", "score"]
    rows = df.collect()
    assert all(r["tag"] is None and r["score"] is None for r in rows)
    assert len(rows) == 5

    # appends with the evolved schema land; duplicate add rejected
    write_delta(
        spark.createDataFrame([(9, 1.0, "x", 0.5)], "id long, v double, tag string, score double"),
        path, mode="append",
    )
    assert DeltaTable(spark, path).to_df().count() == 6
    with pytest.raises(ValueError, match="already exists"):
        DeltaTable(spark, path).add_columns([T.StructField("tag", T.StringType())])


def test_liquid_clustering_remembers_layout(spark, tmp_path):
    """liquid_cluster_by: z-order layout + persisted clustering state; a
    plain OPTIMIZE re-clusters using the stored columns, and stats prune
    on every clustered dimension afterwards."""
    import json

    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.stats import prune_files

    path = str(tmp_path / "liquid")
    df = spark.range(4000).selectExpr(
        "id", "CAST(id % 64 AS LONG) AS a", "CAST((id * 7) % 64 AS LONG) AS b"
    ).repartition(8)
    write_delta(df, path, liquid_cluster_by=["a", "b"])

    snap = DeltaLog(path).snapshot()
    dm = json.loads(snap.domain_metadata["delta.clustering"])
    assert dm == {"clusteringColumns": ["a", "b"]}

    # scatter the layout with unclustered appends, then plain OPTIMIZE
    write_delta(
        spark.range(4000, 8000).selectExpr(
            "id", "CAST(id % 64 AS LONG) AS a", "CAST((id * 7) % 64 AS LONG) AS b"
        ).repartition(8),
        path,
        mode="append",
    )
    t = DeltaTable(spark, path)
    res = t.compact(target_file_size=16 * 1024)  # force multiple output files
    assert res["files_added"] >= 2

    snap = DeltaLog(path).snapshot()
    assert snap.num_files >= 2
    # after re-clustering, BOTH columns prune most files
    for col in ("a", "b"):
        kept = prune_files(snap, [(col, "=", 3)])
        assert len(kept) < snap.num_files, col


def test_identity_columns(spark, tmp_path):
    """GENERATED ALWAYS AS IDENTITY: distributed assignment, high-water
    mark advancing across appends, explicit values rejected."""
    import pytest

    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "ident")
    df = spark.range(100).selectExpr("CAST(id AS STRING) AS name").repartition(5)
    write_delta(df, path, identity_columns={"rid": (10, 2)})

    t = DeltaTable(spark, path)
    rows = t.to_df().collect()
    ids = sorted(r["rid"] for r in rows)
    assert ids == list(range(10, 10 + 2 * 100, 2))  # start=10, step=2, unique
    snap = DeltaLog(path).snapshot()
    meta = {f.name: f.metadata for f in snap.schema.fields}["rid"]
    assert meta["delta.identity.highWaterMark"] == 10 + 2 * 99 + 2 - 2  # 208
    assert snap.protocol["minWriterVersion"] == 6

    # append without the column: ids continue past the mark
    write_delta(
        spark.range(50).selectExpr("CAST(id AS STRING) AS name").repartition(3),
        path,
        mode="append",
    )
    rows2 = DeltaTable(spark, path).to_df().collect()
    ids2 = sorted(r["rid"] for r in rows2)
    assert len(ids2) == 150 and len(set(ids2)) == 150
    assert ids2 == list(range(10, 10 + 2 * 150, 2))

    # GENERATED ALWAYS: explicit values rejected
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(
            spark.createDataFrame([("x", 999)], "name string, rid long"),
            path,
            mode="append",
        )


# -------------------------------------------- round-2 advice regression tests


def test_config_carrying_append_raises_on_race(spark, tmp_path, monkeypatch):
    """An append that also changes table configuration must NOT blind-retry
    after losing a race: its metaData action was built from the pre-race
    config, so a retry would clobber whatever the winner committed (e.g. a
    concurrently-added CHECK constraint)."""
    import athena_delta_lake_spark.delta.writer as W
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import (
        ConcurrentWriteError,
        add_check_constraint,
    )

    path = str(tmp_path / "occ3")
    write_delta(spark.range(5).selectExpr("id", "cast(id as double) as v"), path)

    real_commit = W._atomic_commit
    raced = {"done": False}

    def racing_commit(log_dir, version, actions):
        if not raced["done"]:
            raced["done"] = True
            monkeypatch.setattr(W, "_atomic_commit", real_commit)
            add_check_constraint(spark, path, "id_nonneg", "id >= 0")
            monkeypatch.setattr(W, "_atomic_commit", racing_commit)
        return real_commit(log_dir, version, actions)

    monkeypatch.setattr(W, "_atomic_commit", racing_commit)
    with pytest.raises(ConcurrentWriteError):
        write_delta(
            spark.range(5, 8).selectExpr("id", "cast(id as double) as v"),
            path,
            mode="append",
            configuration={"myapp.tag": "x"},
        )
    monkeypatch.undo()
    # the racer's constraint survived
    cfg = DeltaLog(path).snapshot().metadata["configuration"]
    assert cfg.get("delta.constraints.id_nonneg") == "id >= 0"


def test_v2_checkpoint_upgrades_protocol(spark, tmp_path):
    """uuid-named checkpoints require the v2Checkpoint reader+writer feature
    (minReaderVersion 3): external classic readers must hit a clean protocol
    gate, not an unparseable _last_checkpoint."""
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "v2p")
    write_delta(spark.range(10).selectExpr("id"), path)
    write_checkpoint(path, v2=True)
    proto = DeltaLog(path).snapshot().protocol
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "v2Checkpoint" in (proto.get("readerFeatures") or [])
    assert "v2Checkpoint" in (proto.get("writerFeatures") or [])
    # idempotent: a second v2 checkpoint commits no further upgrade
    v_before = DeltaLog(path).latest_version()
    write_checkpoint(path, v2=True)
    assert DeltaLog(path).latest_version() == v_before


def test_domain_metadata_upgrades_protocol(spark, tmp_path):
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import set_domain_metadata

    path = str(tmp_path / "dmp")
    write_delta(spark.range(10).selectExpr("id"), path)
    set_domain_metadata(path, "myapp.owner", "team-a")
    proto = DeltaLog(path).snapshot().protocol
    assert proto["minWriterVersion"] == 7
    assert "domainMetadata" in (proto.get("writerFeatures") or [])

    # the liquid-clustering write path declares the feature too
    path2 = str(tmp_path / "dmp2")
    write_delta(
        spark.range(10).selectExpr("id", "id % 3 AS a", "id % 5 AS b"),
        path2,
        liquid_cluster_by=["a", "b"],
    )
    proto2 = DeltaLog(path2).snapshot().protocol
    assert "domainMetadata" in (proto2.get("writerFeatures") or [])


def test_identity_metadata_survives_overwrite(spark, tmp_path):
    """Overwrite must carry identity field metadata forward: values keep
    advancing from the prior high-water mark and GENERATED ALWAYS still
    rejects caller-supplied ids."""
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "idow")
    write_delta(
        spark.range(5).selectExpr("id AS n"),
        path,
        identity_columns={"rid": (100, 10)},
    )
    t1 = DeltaTable(spark, path).to_df()
    ids1 = {r["rid"] for r in t1.collect()}
    assert ids1 == {100, 110, 120, 130, 140}

    # plain overwrite: no identity_columns re-declared
    write_delta(spark.range(3).selectExpr("id AS n"), path, mode="overwrite")
    t2 = DeltaTable(spark, path).to_df()
    ids2 = sorted(r["rid"] for r in t2.collect())
    assert ids2 == [150, 160, 170]  # continues past the prior high-water mark

    # GENERATED ALWAYS still enforced after the overwrite
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(
            spark.range(3).selectExpr("id AS n", "id AS rid"),
            path,
            mode="append",
        )


def test_ict_monotonic_past_cleaned_log_and_clock_backstep(
    spark, tmp_path, monkeypatch
):
    """After cleanup_log removes the predecessor JSON, a wall clock stepping
    BACKWARDS must not mint a smaller inCommitTimestamp: _stamp_ict clamps
    against the checkpoint-recorded last ICT."""
    import time as _time

    import athena_delta_lake_spark.delta.writer as W
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import cleanup_log, write_checkpoint

    path = str(tmp_path / "ictc")
    write_delta(
        spark.range(5).selectExpr("id"),
        path,
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    write_delta(spark.range(5, 8).selectExpr("id"), path, mode="append")
    prev_ict = DeltaLog(path).commit_timestamp(DeltaLog(path).latest_version())
    write_checkpoint(path)
    cleanup_log(path, retention_hours=0.0)

    real_time = _time.time
    monkeypatch.setattr(W.time, "time", lambda: real_time() - 3600)  # clock jumps back
    write_delta(spark.range(8, 10).selectExpr("id"), path, mode="append")
    monkeypatch.undo()
    new_ict = DeltaLog(path).commit_timestamp(DeltaLog(path).latest_version())
    assert new_ict > prev_ict


def test_set_unset_table_properties(spark, tmp_path):
    """ALTER TABLE SET/UNSET TBLPROPERTIES: metadata-only, enforced
    immediately, ICT enablement stamped like the write path."""
    from athena_delta_lake_spark.delta import (
        DeltaLog,
        DeltaTable,
        set_table_properties,
        unset_table_properties,
        write_delta,
    )

    path = str(tmp_path / "props_tbl")
    write_delta(spark.createDataFrame([(1,)], "id long"), path)
    v = set_table_properties(path, {"delta.appendOnly": "true", "team": "ml"})
    snap = DeltaLog(path).snapshot()
    cfg = snap.metadata["configuration"]
    assert cfg["delta.appendOnly"] == "true" and cfg["team"] == "ml"
    # appendOnly enforced from the very next commit
    with pytest.raises(ValueError, match="append-only"):
        write_delta(
            spark.createDataFrame([(2,)], "id long"), path, mode="overwrite"
        )
    assert set_table_properties(path, {"team": "ml"}) == v  # no-op
    unset_table_properties(path, ["delta.appendOnly", "never_there"])
    write_delta(
        spark.createDataFrame([(2,)], "id long"), path, mode="overwrite"
    )
    assert DeltaTable(spark, path).count() == 1

    # ICT enablement via properties stamps version/timestamp + feature
    v2 = set_table_properties(path, {"delta.enableInCommitTimestamps": "true"})
    cfg = DeltaLog(path).snapshot().metadata["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == str(v2)
    feats = DeltaLog(path).snapshot().protocol.get("writerFeatures") or []
    assert "inCommitTimestamp" in feats

    with pytest.raises(ValueError, match="enable_column_mapping"):
        set_table_properties(path, {"delta.columnMapping.mode": "name"})
