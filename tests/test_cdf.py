"""Change Data Feed analog (delta/cdf.py): row-level insert/delete changes
derived from the copy-on-write log (no reference analog — read-only
connector, DeltaMetadataHandler.scala:99)."""

import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.dml import compact, delete, update


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "cdf")
    write_delta(
        spark.range(10).selectExpr("id", "id % 2 as k", "cast(id as double) as v"),
        path,
    )
    write_delta(
        spark.range(10, 15).selectExpr("id", "id % 2 as k", "cast(id as double) as v"),
        path,
    )
    return path


def test_appends_are_inserts(spark, tbl):
    ch = DeltaTable(spark, tbl).table_changes(0, 1)
    assert ch.filter("_change_type = 'insert'").count() == 15
    assert ch.filter("_change_type = 'delete'").count() == 0
    by_v = dict(
        ch.groupBy("_commit_version").count().collect()
    )
    assert by_v == {0: 10, 1: 5}


def test_delete_emits_delete_rows(spark, tbl):
    delete(spark, tbl, "id >= 12")
    ch = DeltaTable(spark, tbl).table_changes(2, 2)
    deleted = {r["id"] for r in ch.filter("_change_type = 'delete'").collect()}
    assert {12, 13, 14} <= deleted
    inserted = {r["id"] for r in ch.filter("_change_type = 'insert'").collect()}
    # copy-on-write rewrite re-adds the kept rows of the touched file
    assert deleted - {12, 13, 14} == inserted


def test_update_emits_pre_and_post_image(spark, tbl):
    update(spark, tbl, {"v": "99.0"}, "id = 3")
    ch = DeltaTable(spark, tbl).table_changes(2, 2)
    pre = ch.filter("_change_type = 'delete' and id = 3").collect()
    post = ch.filter("_change_type = 'insert' and id = 3").collect()
    assert len(pre) == 1 and pre[0]["v"] == 3.0
    assert len(post) == 1 and post[0]["v"] == 99.0


def test_compaction_is_invisible(spark, tbl):
    res = compact(spark, tbl, target_file_size=1 << 30)
    assert res["files_removed"] > 0  # it really did rewrite files
    t = DeltaTable(spark, tbl)
    v = t.version()
    ch = t.table_changes(v, v)
    assert ch.count() == 0


def test_net_changes_reconstruct_snapshot(spark, tbl):
    delete(spark, tbl, "k = 1")
    t = DeltaTable(spark, tbl)
    ch = t.table_changes(0)
    # replay: last change per row id wins
    from pyspark.sql import Window as W

    w = W.partitionBy("id").orderBy(
        F.desc("_commit_version"),
        # within one commit a rewrite emits delete(old)+insert(new): insert wins
        F.desc(F.col("_change_type") == "insert"),
    )
    latest = (
        ch.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 and _change_type = 'insert'")
        .select("id", "k", "v")
    )
    now = t.to_df().select("id", "k", "v")
    assert latest.exceptAll(now).count() == 0
    assert now.exceptAll(latest).count() == 0


def test_cdf_mor_delete_exact_rows(spark, tmp_path):
    """A merge-on-read DELETE surfaces in table_changes as EXACTLY the
    newly-DV'd rows (delete), not a whole-file delete+reinsert."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.delta.cdf import table_changes

    path = str(tmp_path / "cdf_mor")
    write_delta(
        spark.createDataFrame([(i, i * 2) for i in range(100)], "id long, v long"),
        path,
    )
    t = DeltaTable(spark, path)
    t.delete(where="id % 25 = 0", mode="mor")  # v1: DV over 4 rows
    ch = table_changes(spark, path, 1, 1).collect()
    assert len(ch) == 4
    assert all(r["_change_type"] == "delete" for r in ch)
    assert sorted(r["id"] for r in ch) == [0, 25, 50, 75]
    # a second MOR delete only emits ITS rows (DV diff, not cumulative)
    t.delete(where="id in (1, 2)", mode="mor")
    ch2 = table_changes(spark, path, 2, 2).collect()
    assert sorted(r["id"] for r in ch2) == [1, 2]
    assert all(r["_change_type"] == "delete" for r in ch2)


def test_streaming_change_feed(spark, tmp_path):
    """readChangeFeed streaming: inserts, copy-on-write deletes, and
    MOR (DV) deletes all arrive labeled with _change_type/_commit_version."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.sources.deltapond_source import (
        register as register_ds,
    )
    from athena_delta_lake_spark.streaming import run_to_memory

    register_ds(spark)
    path = str(tmp_path / "cdf_stream")
    write_delta(
        spark.createDataFrame([(i, i % 2) for i in range(40)], "id long, p int"),
        path,
    )  # v0: 40 inserts
    t = DeltaTable(spark, path)
    t.delete(where="id >= 30", mode="mor")  # v1: 10 DV deletes
    write_delta(
        spark.createDataFrame([(100, 0)], "id long, p int"), path, mode="append"
    )  # v2: 1 insert

    stream = (
        spark.readStream.format("deltapond")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    agg = stream.groupBy("_change_type", "_commit_version").count()
    out = {
        (r["_change_type"], r["_commit_version"]): r["count"]
        for r in run_to_memory(agg, "cdf_stream_out", "complete").collect()
    }
    assert out == {("insert", 0): 40, ("delete", 1): 10, ("insert", 2): 1}


def test_cdf_mor_update_and_merge_exact_rows(spark, tmp_path):
    """MOR UPDATE/MERGE surface in table_changes as exactly the DV-diff
    delete rows (old versions) plus the appended insert rows (new
    versions) — never a whole-file delete+reinsert."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.delta.cdf import table_changes

    path = str(tmp_path / "cdf_morum")
    write_delta(
        spark.createDataFrame([(i, i * 2) for i in range(100)], "id long, v long"),
        path,
    )
    t = DeltaTable(spark, path)
    t.update({"v": "v + 1000"}, where="id < 5", mode="mor")  # v1
    ch = table_changes(spark, path, 1, 1)
    dels = sorted(r["id"] for r in ch.filter("_change_type = 'delete'").collect())
    ins = sorted(
        (r["id"], r["v"]) for r in ch.filter("_change_type = 'insert'").collect()
    )
    assert dels == [0, 1, 2, 3, 4]
    assert ins == [(i, i * 2 + 1000) for i in range(5)]

    # MOR merge: 3 updates + 2 inserts -> 3 deletes (old) + 5 inserts (new)
    src = spark.createDataFrame(
        [(97, -1), (98, -1), (99, -1), (200, -2), (201, -2)], "id long, v long"
    )
    t.merge(src, keys=["id"], mode="mor")  # v2
    ch2 = table_changes(spark, path, 2, 2)
    dels2 = sorted(r["id"] for r in ch2.filter("_change_type = 'delete'").collect())
    ins2 = sorted(
        (r["id"], r["v"]) for r in ch2.filter("_change_type = 'insert'").collect()
    )
    assert dels2 == [97, 98, 99]
    assert ins2 == [(97, -1), (98, -1), (99, -1), (200, -2), (201, -2)]

    # conditional MOR matched-delete: only condition-passing rows change
    t.merge(
        spark.createDataFrame([(10, 0), (11, 0)], "id long, v long"),
        keys=["id"],
        when_matched="delete",
        when_not_matched=None,
        matched_condition="t.id % 2 = 0",
        mode="mor",
    )  # v3
    ch3 = table_changes(spark, path, 3, 3).collect()
    assert [(r["id"], r["_change_type"]) for r in ch3] == [(10, "delete")]


def test_cdf_third_party_mor_layout(spark, tmp_path):
    """table_changes over a HAND-BUILT third-party MOR table (no cdc
    actions, DV descriptors written straight into the log — nothing from
    this engine's writer): the DV-diff fallback must emit exactly the
    newly-DV'd rows as deletes, and a DV shrink (RESTORE-style bare
    re-add) as resurrect inserts — computed executor-side (the bitmap
    parse/diff runs in mapInPandas; delta/cdf.py _dv_diff_rows)."""
    import json

    from athena_delta_lake_spark.delta.cdf import table_changes
    from athena_delta_lake_spark.delta.deletion_vectors import write_dv_file

    path = str(tmp_path / "third_party_mor")
    os.makedirs(path)
    spark.range(20).selectExpr("id", "id * 10 as v").coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    data_file = next(
        f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")
    )
    os.rename(
        os.path.join(str(tmp_path / "stage"), data_file),
        os.path.join(path, "part-000.parquet"),
    )
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)

    def commit(version, actions):
        with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")

    base_add = {
        "path": "part-000.parquet",
        "partitionValues": {},
        "size": os.path.getsize(os.path.join(path, "part-000.parquet")),
        "modificationTime": 1,
        "dataChange": True,
    }
    commit(
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            {
                "metaData": {
                    "id": "3p",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {"add": base_add},
        ],
    )
    # v1: third-party MOR delete of rows 3,7,11 (remove + re-add with DV)
    dv1 = write_dv_file(path, [3, 7, 11])
    commit(
        1,
        [
            {"remove": {"path": "part-000.parquet", "dataChange": True}},
            {"add": {**base_add, "deletionVector": dv1}},
        ],
    )
    # v2: DV grows to {3,7,11,15} (incremental MOR delete)
    dv2 = write_dv_file(path, [3, 7, 11, 15])
    commit(
        2,
        [
            {"remove": {"path": "part-000.parquet", "dataChange": True}},
            {"add": {**base_add, "deletionVector": dv2}},
        ],
    )
    # v3: RESTORE-style bare re-add shrinking the DV back to {3}
    dv3 = write_dv_file(path, [3])
    commit(3, [{"add": {**base_add, "deletionVector": dv3}}])

    ch1 = table_changes(spark, path, 1, 1).collect()
    assert sorted((r["id"], r["_change_type"]) for r in ch1) == [
        (3, "delete"),
        (7, "delete"),
        (11, "delete"),
    ]
    ch2 = table_changes(spark, path, 2, 2).collect()
    assert [(r["id"], r["_change_type"]) for r in ch2] == [(15, "delete")]
    ch3 = table_changes(spark, path, 3, 3).collect()
    assert sorted((r["id"], r["_change_type"]) for r in ch3) == [
        (7, "insert"),
        (11, "insert"),
        (15, "insert"),
    ]
    # cumulative feed reconstructs the final live set
    full = table_changes(spark, path, 0, 3)
    net = (
        full.groupBy("id")
        .agg(
            F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(-1)).alias(
                "n"
            )
        )
        .filter("n > 0")
    )
    live = sorted(r["id"] for r in net.collect())
    assert live == [i for i in range(20) if i != 3]


def test_cdf_across_rename_boundary_aligns_columns(spark, tmp_path):
    """A RENAME COLUMN (column mapping) mid-range must NOT split the
    change feed into two NULL-filled columns: pieces read with the old
    logical name align to the ending snapshot's name through the
    physical identity (found by the round-6 DML fuzz as an over-delete
    in the apply-diff invariant; delta/cdf.py _align_piece_names)."""
    from athena_delta_lake_spark.delta.cdf import table_changes
    from athena_delta_lake_spark.delta.writer import rename_column
    from athena_delta_lake_spark.delta.dml import delete
    from athena_delta_lake_spark.delta.writer import enable_column_mapping

    path = str(tmp_path / "ren")
    write_delta(
        spark.range(10).selectExpr("id", "cast(id as double) as v"), path
    )  # v0: insert under the old name
    enable_column_mapping(path)  # v1
    rename_column(path, "v", "val")  # v2 (logical rename, physical stays)
    delete(spark, path, "id >= 7")  # v3: deletes read the val-era schema
    ch = table_changes(spark, path, 0, 3)
    assert "val" in ch.columns and "v" not in ch.columns
    rows = ch.collect()
    # every change row carries a real value in the ALIGNED column
    assert all(r["val"] is not None for r in rows)
    ins = sorted(r["id"] for r in rows if r["_change_type"] == "insert")
    dels = sorted(r["id"] for r in rows if r["_change_type"] == "delete")
    assert ins == list(range(10)) and dels == [7, 8, 9]
    # apply-diff reconstructs the live state with aligned values
    from collections import Counter

    cnt = Counter()
    for r in rows:
        key = (r["id"], r["val"])
        cnt[key] += 1 if r["_change_type"] == "insert" else -1
    live = sorted(k for k, c in cnt.items() if c > 0)
    assert live == [(i, float(i)) for i in range(7)]


def test_cdf_drop_then_rename_collision(spark, tmp_path):
    """DROP COLUMN b then RENAME a TO b inside one change-feed range:
    the dead era-b column (physical identity gone at end) must be
    dropped from old pieces instead of colliding with the rename target
    (COLUMN_ALREADY_EXISTS on the union)."""
    from athena_delta_lake_spark.delta.cdf import table_changes
    from athena_delta_lake_spark.delta.writer import (
        drop_column,
        enable_column_mapping,
        rename_column,
    )

    path = str(tmp_path / "dropren")
    write_delta(
        spark.range(6).selectExpr(
            "id", "cast(id as double) as a", "id * 10 as b"
        ),
        path,
    )  # v0
    enable_column_mapping(path)  # v1
    drop_column(path, "b")  # v2
    rename_column(path, "a", "b")  # v3
    delete(spark, path, "id >= 4")  # v4
    ch = table_changes(spark, path, 0, 4)
    assert sorted(c for c in ch.columns if not c.startswith("_")) == ["b", "id"]
    rows = ch.collect()
    # era-a values flow into the aligned 'b' column; the dropped old b
    # (id*10) is gone, so every b value equals the double a value
    assert all(r["b"] == float(r["id"]) for r in rows)
    dels = sorted(r["id"] for r in rows if r["_change_type"] == "delete")
    assert dels == [4, 5]


def test_cdf_vacuumed_file_with_empty_direction_diff(spark, tmp_path):
    """A same-path re-add whose DV changed DESCRIPTOR but not content
    (same positions, new blob) contributes nothing in either direction —
    a VACUUMed data file must then NOT fail the range (the old code
    raised DELTA_CHANGE_DATA_FILE_NOT_FOUND before computing the
    diff)."""
    import json

    from athena_delta_lake_spark.delta.cdf import table_changes
    from athena_delta_lake_spark.delta.deletion_vectors import write_dv_file

    path = str(tmp_path / "vac")
    os.makedirs(path)
    spark.range(10).selectExpr("id").coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    data_file = next(
        f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")
    )
    os.rename(
        os.path.join(str(tmp_path / "stage"), data_file),
        os.path.join(path, "part-000.parquet"),
    )
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)

    def commit(version, actions):
        with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")

    base_add = {
        "path": "part-000.parquet",
        "partitionValues": {},
        "size": os.path.getsize(os.path.join(path, "part-000.parquet")),
        "modificationTime": 1,
        "dataChange": True,
    }
    dv1 = write_dv_file(path, [2, 5])
    dv2 = write_dv_file(path, [2, 5])  # same content, different blob
    commit(
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            {
                "metaData": {
                    "id": "vac",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {"add": {**base_add, "deletionVector": dv1}},
        ],
    )
    commit(
        1,
        [
            {"remove": {"path": "part-000.parquet", "dataChange": True}},
            {"add": {**base_add, "deletionVector": dv2}},
        ],
    )
    os.remove(os.path.join(path, "part-000.parquet"))  # "VACUUMed"
    # content-identical DV swap: no changes, and no spurious
    # FILE_NOT_FOUND despite the missing data file
    assert table_changes(spark, path, 1, 1).count() == 0


def test_table_changes_tvf_timestamp_bounds(spark, tmp_path):
    """table_changes('t', '<ts>' [, '<ts>']): quoted bounds are
    timestamps (delta-spark contract) resolved against each commit's
    authoritative time; unquoted integers stay versions."""
    import datetime as dt

    import pytest

    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(3).selectExpr("id"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    pond.sql("INSERT INTO lake.t VALUES (10)")  # v1
    pond.sql("INSERT INTO lake.t VALUES (20)")  # v2
    log = DeltaLog(path)
    tz = dt.timezone.utc
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def iso(v, off_ms):
        return (
            dt.datetime.fromtimestamp(
                (log.commit_timestamp(v) + off_ms) / 1000.0, tz
            )
            .replace(tzinfo=None)
            .isoformat(sep=" ", timespec="milliseconds")
        )

    # start at (just before) v1's time -> v1..latest
    got = sorted(
        r["id"]
        for r in pond.sql(
            f"SELECT id FROM table_changes('lake.t', '{iso(1, -1)}')"
        ).collect()
    )
    assert got == [10, 20]
    # bounded [v1, v1] via end timestamp just before v2
    got = sorted(
        r["id"]
        for r in pond.sql(
            "SELECT id FROM table_changes('lake.t', "
            f"'{iso(1, -1)}', '{iso(2, -1)}')"
        ).collect()
    )
    assert got == [10]
    # mixed: version start, timestamp end
    got = sorted(
        r["id"]
        for r in pond.sql(
            f"SELECT id FROM table_changes('lake.t', 0, '{iso(1, 1)}')"
        ).collect()
    )
    assert got == [0, 1, 2, 10]
    # start after the latest commit refuses
    with pytest.raises(Exception, match="after the latest"):
        pond.sql(
            f"SELECT id FROM table_changes('lake.t', '{iso(2, 60_000)}')"
        ).collect()


def test_table_changes_timestamp_bound_after_truncated_history(spark, tmp_path):
    """Timestamp bounds must resolve within the RETAINED version range —
    after DROP FEATURE ... TRUNCATE HISTORY the early commit JSONs are
    gone (regression: binary search probed version 0 unconditionally)."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.dml import delete_mor, reorg_purge

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(20).selectExpr("id"),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delete_mor(spark, path, "id < 5")
    reorg_purge(spark, path)
    pond.sql(
        "ALTER TABLE lake.t DROP FEATURE deletionVectors TRUNCATE HISTORY"
    )
    pond.sql("INSERT INTO lake.t VALUES (99)")
    got = sorted(
        r["id"]
        for r in pond.sql(
            "SELECT id FROM table_changes('lake.t', '1970-01-01')"
        ).collect()
    )
    assert got == [99]  # only post-truncation changes are derivable
