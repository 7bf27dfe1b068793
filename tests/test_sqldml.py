"""SQL DML/DDL statements through the metastore-less pond endpoint.

The reference connector is read-only (users run DML via Athena itself);
pond.sql routes the same statements — classified from the parsed plan,
never by text matching — onto the native Delta write layer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.catalog import DeltaPond


@pytest.fixture
def pond(spark, tmp_path):
    p = DeltaPond(spark, str(tmp_path / "pond"))
    p.sql("CREATE SCHEMA lake")
    return p


def _mk(pond, name="t"):
    pond.sql(
        f"CREATE TABLE lake.{name} PARTITIONED BY (ds) AS "
        "SELECT id, CAST(id * 2 AS DOUBLE) AS v, "
        "CASE WHEN id < 5 THEN 'a' ELSE 'b' END AS ds FROM range(10)"
    )


def test_ctas_partitioned(pond):
    _mk(pond)
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 10
    # partitioned layout on disk (hive dirs)
    root = pond.table_path("lake", "t")
    assert any(d.startswith("ds=") for d in os.listdir(root))
    # IF NOT EXISTS: second CTAS is a no-op
    r = pond.sql("CREATE TABLE IF NOT EXISTS lake.t AS SELECT 1 AS x").first()
    assert r["operation"] == "ctas_skipped"
    with pytest.raises(ValueError, match="already exists"):
        pond.sql("CREATE TABLE lake.t AS SELECT 1 AS x")


def test_insert_positional_and_column_list(pond):
    _mk(pond)
    pond.sql("INSERT INTO lake.t SELECT id + 100, -1.0, 'c' FROM range(2)")
    assert pond.sql(
        "SELECT count(*) AS n FROM lake.t WHERE ds = 'c'"
    ).first()["n"] == 2
    # explicit column list: unlisted columns become NULL
    pond.sql("INSERT INTO lake.t (id, ds) SELECT 999, 'c'")
    row = pond.sql("SELECT v FROM lake.t WHERE id = 999").first()
    assert row["v"] is None
    with pytest.raises(ValueError, match="not in table"):
        pond.sql("INSERT INTO lake.t (nope) SELECT 1")
    with pytest.raises(ValueError, match="columns"):
        pond.sql("INSERT INTO lake.t SELECT 1")


def test_insert_overwrite_partition_is_selective(pond):
    _mk(pond)
    pond.sql(
        "INSERT OVERWRITE lake.t PARTITION (ds='a') SELECT id + 50, 0.0 FROM range(3)"
    )
    got = {
        r["ds"]: r["n"]
        for r in pond.sql(
            "SELECT ds, count(*) AS n FROM lake.t GROUP BY ds"
        ).collect()
    }
    assert got == {"a": 3, "b": 5}  # partition b untouched
    # full overwrite replaces everything
    pond.sql("INSERT OVERWRITE lake.t SELECT 1, 1.0, 'z'")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 1


def test_delete_update_with_alias(pond):
    _mk(pond)
    pond.sql("UPDATE lake.t AS x SET v = x.v + 0.5 WHERE x.ds = 'a'")
    assert pond.sql(
        "SELECT sum(v) AS s FROM lake.t WHERE ds = 'a'"
    ).first()["s"] == pytest.approx(sum(i * 2 + 0.5 for i in range(5)))
    pond.sql("DELETE FROM lake.t AS x WHERE x.ds = 'b' AND x.id >= 8")
    assert pond.sql(
        "SELECT count(*) AS n FROM lake.t WHERE ds = 'b'"
    ).first()["n"] == 3


def test_merge_multi_clause_cdc(pond, spark):
    _mk(pond)
    spark.sql(
        "SELECT 2 AS id, 0.0 AS v, 'a' AS ds, 'D' AS op "
        "UNION ALL SELECT 3, 100.0, 'a', 'U' "
        "UNION ALL SELECT 55, 7.0, 'b', 'U'"
    ).createOrReplaceTempView("cdc")
    pond.sql(
        "MERGE INTO lake.t AS tgt "
        "USING (SELECT id, v, ds FROM cdc WHERE op IN ('D', 'U')) AS s "
        "ON tgt.id = s.id "
        "WHEN MATCHED AND s.v = 0.0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {
        r["id"]: r["v"] for r in pond.sql("SELECT id, v FROM lake.t").collect()
    }
    assert 2 not in rows  # tombstone deleted
    assert rows[3] == 100.0  # updated
    assert rows[55] == 7.0  # inserted


def test_merge_not_matched_by_source_delete(pond, spark):
    _mk(pond)
    pond.sql(
        "MERGE INTO lake.t USING (SELECT id, v, ds FROM lake.t WHERE id < 3) s "
        "ON t.id = s.id "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert pond.sql("SELECT max(id) AS m FROM lake.t").first()["m"] == 2


def test_merge_insert_only(pond, spark):
    _mk(pond)
    before = pond.sql("SELECT sum(v) AS s FROM lake.t").first()["s"]
    pond.sql(
        "MERGE INTO lake.t USING (SELECT 0 AS id, 42.0 AS v, 'a' AS ds "
        "UNION ALL SELECT 100, 1.0, 'c') s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    # matched row id=0 kept its target version; only id=100 inserted
    assert pond.sql("SELECT v FROM lake.t WHERE id = 0").first()["v"] == 0.0
    assert pond.sql("SELECT sum(v) AS s FROM lake.t").first()["s"] == before + 1.0


def test_merge_narrow_source_assignment_and_no_key_refused(pond):
    """Since round 7 a per-column SET with a NARROW source (keys only)
    is the supported 'flag these ids' shape; an ON clause with no
    orientable equality is still refused."""
    _mk(pond)
    pond.sql(
        "MERGE INTO lake.t USING (SELECT CAST(1 AS BIGINT) AS id) s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = 1.0"
    )
    assert pond.sql("SELECT v FROM lake.t WHERE id = 1").first()["v"] == 1.0
    with pytest.raises(ValueError, match="equality"):
        pond.sql(
            "MERGE INTO lake.t USING (SELECT 1 AS id, 0.0 AS v, 'a' AS ds) s "
            "ON t.id > s.id WHEN MATCHED THEN UPDATE SET *"
        )


def test_truncate_drop_schema_ddl(pond):
    _mk(pond)
    pond.sql("TRUNCATE TABLE lake.t")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 0
    pond.sql("DROP TABLE lake.t")
    assert pond.list_tables("lake") == []
    r = pond.sql("DROP TABLE IF EXISTS lake.t").first()
    assert r["operation"] == "drop_skipped"
    r = pond.sql("CREATE SCHEMA IF NOT EXISTS lake").first()
    assert r["operation"] == "schema_exists"
    pond.sql("CREATE SCHEMA lake2")
    assert "lake2" in pond.list_schemas()


def test_select_with_dml_lookalike_literal_not_routed(pond):
    _mk(pond)
    got = pond.sql(
        "SELECT count(*) AS n FROM lake.t WHERE 'DELETE FROM lake.t' <> ''"
    ).first()
    assert got["n"] == 10  # nothing deleted: routing is parse-grounded


def test_alter_table_ddl_roundtrip(pond):
    _mk(pond)
    pond.sql("ALTER TABLE lake.t ADD COLUMNS (tag STRING, score DOUBLE)")
    assert pond.sql("SELECT tag FROM lake.t LIMIT 1").first()["tag"] is None
    pond.sql("ALTER TABLE lake.t SET TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    pond.sql("ALTER TABLE lake.t RENAME COLUMN tag TO label")
    cols = pond.sql("SELECT * FROM lake.t").columns
    assert "label" in cols and "tag" not in cols
    pond.sql("ALTER TABLE lake.t DROP COLUMN score")
    assert "score" not in pond.sql("SELECT * FROM lake.t").columns
    pond.sql("ALTER TABLE lake.t SET TBLPROPERTIES ('custom.owner' = 'me')")
    from athena_delta_lake_spark.delta.log import DeltaLog

    cfg = DeltaLog(pond.table_path("lake", "t")).snapshot().metadata["configuration"]
    assert cfg["custom.owner"] == "me"
    pond.sql("ALTER TABLE lake.t UNSET TBLPROPERTIES ('custom.owner')")
    cfg = DeltaLog(pond.table_path("lake", "t")).snapshot().metadata["configuration"]
    assert "custom.owner" not in cfg


def test_show_and_describe(pond):
    _mk(pond)
    rows = pond.sql("SHOW TABLES IN lake").collect()
    assert [(r["namespace"], r["tableName"]) for r in rows] == [("lake", "t")]
    d = {r["col_name"]: r["data_type"] for r in pond.sql("DESCRIBE TABLE lake.t").collect()}
    assert d == {"id": "bigint", "v": "double", "ds": "string"}
    parts = sorted(r["partition"] for r in pond.sql("SHOW PARTITIONS lake.t").collect())
    assert parts == ["ds=a", "ds=b"]


def test_insert_values(pond):
    _mk(pond)
    pond.sql("INSERT INTO lake.t VALUES (50, 1.5, 'c'), (51, 2.5, 'c')")
    assert pond.sql("SELECT count(*) AS n FROM lake.t WHERE ds = 'c'").first()["n"] == 2


def test_create_empty_table_then_insert(pond):
    pond.sql(
        "CREATE TABLE lake.e (a INT NOT NULL, b STRING) PARTITIONED BY (ds STRING)"
    )
    assert pond.sql("SELECT count(*) AS n FROM lake.e").first()["n"] == 0
    d = {r["col_name"]: r["data_type"] for r in pond.sql("DESCRIBE TABLE lake.e").collect()}
    assert d == {"a": "int", "b": "string", "ds": "string"}
    pond.sql("INSERT INTO lake.e VALUES (1, 'x', 'd1'), (2, 'y', 'd2')")
    assert pond.sql("SELECT sum(a) AS s FROM lake.e").first()["s"] == 3
    r = pond.sql("CREATE TABLE IF NOT EXISTS lake.e (z INT)").first()
    assert r["operation"] == "create_skipped"


def test_check_constraint_sql(pond):
    _mk(pond)
    pond.sql("ALTER TABLE lake.t ADD CONSTRAINT vpos CHECK (v >= 0.0)")
    with pytest.raises(Exception, match="vpos|constraint|CHECK"):
        pond.sql("INSERT INTO lake.t VALUES (900, -5.0, 'c')")
    pond.sql("INSERT INTO lake.t VALUES (901, 5.0, 'c')")  # satisfying row fine
    pond.sql("ALTER TABLE lake.t DROP CONSTRAINT vpos")
    pond.sql("INSERT INTO lake.t VALUES (902, -5.0, 'c')")  # now allowed
    assert pond.sql("SELECT count(*) AS n FROM lake.t WHERE ds='c'").first()["n"] == 2
    r = pond.sql("ALTER TABLE lake.t DROP CONSTRAINT IF EXISTS nope").first()
    assert r["operation"] == "drop_constraint_skipped"


def test_insert_replace_where_sql(pond):
    _mk(pond)
    pond.sql(
        "INSERT INTO lake.t REPLACE WHERE ds = 'a' "
        "SELECT id + 200, 9.0, 'a' FROM range(2)"
    )
    got = {
        r["ds"]: r["n"]
        for r in pond.sql("SELECT ds, count(*) AS n FROM lake.t GROUP BY ds").collect()
    }
    assert got == {"a": 2, "b": 5}
    # rows violating the predicate are rejected
    with pytest.raises(Exception, match="predicate|replace"):
        pond.sql(
            "INSERT INTO lake.t REPLACE WHERE ds = 'a' SELECT 1, 1.0, 'zzz'"
        )


def test_alias_prefix_inside_literal_survives(pond):
    """A string literal containing '<alias>.' must not be rewritten when
    conditions are de-aliased (quote-aware substitution)."""
    pond.sql("CREATE TABLE lake.s (id BIGINT, tag STRING)")
    pond.sql("INSERT INTO lake.s VALUES (1, 'x.y'), (2, 'z')")
    pond.sql("DELETE FROM lake.s AS x WHERE x.tag = 'x.y'")
    rows = pond.sql("SELECT tag FROM lake.s").collect()
    assert [r["tag"] for r in rows] == ["z"]


def test_merge_same_side_on_condition_rejected(pond):
    """A degenerate same-side ON (t.id = t.id) carries no target-source
    equi-key: since round 7 it classifies as a residual conjunct, and a
    merge with ONLY residuals is refused (the touched-file planner needs
    an equi-key to hash-join on)."""
    _mk(pond)
    with pytest.raises(ValueError, match="at least one"):
        pond.sql(
            "MERGE INTO lake.t AS t USING (SELECT 1 AS id, 0.0 AS v, 'a' AS ds) s "
            "ON t.id = t.id WHEN MATCHED THEN UPDATE SET *"
        )


def test_non_pond_statements_fall_through(pond, spark):
    """DML/DDL targeting names outside the pond reach spark.sql untouched
    (e.g. catalog tables, temp views) instead of erroring in the router."""
    spark.sql("CREATE DATABASE IF NOT EXISTS sqldmldb")
    spark.sql("DROP TABLE IF EXISTS sqldmldb.m")
    spark.sql("CREATE TABLE sqldmldb.m (x INT) USING parquet")
    try:
        pond.sql("INSERT INTO sqldmldb.m SELECT 5")
        assert pond.sql("SELECT sum(x) AS s FROM sqldmldb.m").first()["s"] == 5
        pond.sql("DROP TABLE sqldmldb.m")
    finally:
        spark.sql("DROP TABLE IF EXISTS sqldmldb.m")
        spark.sql("DROP DATABASE IF EXISTS sqldmldb")


def test_call_procedures(pond):
    _mk(pond)
    pond.sql("INSERT INTO lake.t SELECT id + 500, 1.0, 'a' FROM range(3)")
    r = pond.sql("CALL optimize('lake.t')").first()
    assert r["operation"] == "optimize"
    r = pond.sql("CALL checkpoint(tbl => 'lake.t')").first()
    assert r["checkpoint_version"] >= 1
    pond.sql("DELETE FROM lake.t WHERE ds = 'b'")
    pond.sql("CALL restore(tbl => 'lake.t', version => 0)")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 10
    r = pond.sql("CALL vacuum('lake.t', 0.0)").first()
    assert r["operation"] == "vacuum"
    with pytest.raises(ValueError, match="unknown procedure"):
        pond.sql("CALL frobnicate('lake.t')")


def test_drop_schema_sql(pond):
    pond.sql("CREATE SCHEMA tmpsch")
    assert "tmpsch" in pond.list_schemas()
    pond.sql("DROP SCHEMA tmpsch")
    assert "tmpsch" not in pond.list_schemas()
    _mk(pond)
    with pytest.raises(ValueError, match="not empty"):
        pond.sql("DROP SCHEMA lake")
    pond.sql("DROP SCHEMA lake CASCADE")
    assert "lake" not in pond.list_schemas()


def test_dv_enabled_table_routes_to_merge_on_read(pond, spark):
    """SQL DELETE/UPDATE on a delta.enableDeletionVectors=true table use
    deletion vectors (no file rewrite), per Delta semantics."""
    from athena_delta_lake_spark.delta.log import DeltaLog

    _mk(pond)
    pond.sql(
        "ALTER TABLE lake.t SET TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')"
    )
    path = pond.table_path("lake", "t")
    pond.sql("DELETE FROM lake.t WHERE id = 3")
    snap = DeltaLog(path).snapshot()
    assert any(f.deletion_vector for f in snap.files)  # MOR, not rewrite
    pond.sql("UPDATE lake.t SET v = 0.0 WHERE id = 7")
    assert pond.sql("SELECT v FROM lake.t WHERE id = 7").first()["v"] == 0.0
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 9


def test_create_table_generated_and_identity_columns(pond):
    pond.sql(
        "CREATE TABLE lake.g ("
        " id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),"
        " a INT,"
        " b INT GENERATED ALWAYS AS (a + 1))"
    )
    # identity + generated values materialize on insert (engine-assigned)
    pond.sql("INSERT INTO lake.g (a) SELECT CAST(id AS INT) FROM range(3)")
    rows = sorted(
        (r["id"], r["a"], r["b"])
        for r in pond.sql("SELECT id, a, b FROM lake.g").collect()
    )
    assert [r[0] for r in rows] == [10, 12, 14]  # START 10, STEP 2
    assert all(b == a + 1 for _i, a, b in rows)  # generation expression


def test_create_table_column_defaults(pond):
    from athena_delta_lake_spark.delta.log import DeltaLog

    pond.sql(
        "CREATE TABLE lake.d (id BIGINT, tag STRING DEFAULT 'n/a', "
        "w DOUBLE DEFAULT 1.5)"
    )
    pond.sql("INSERT INTO lake.d (id) SELECT 1")
    pond.sql("INSERT INTO lake.d (id, tag) SELECT 2, 'x'")
    rows = {
        r["id"]: (r["tag"], r["w"])
        for r in pond.sql("SELECT id, tag, w FROM lake.d").collect()
    }
    assert rows == {1: ("n/a", 1.5), 2: ("x", 1.5)}
    proto = DeltaLog(pond.table_path("lake", "d")).snapshot().protocol
    assert "allowColumnDefaults" in (proto.get("writerFeatures") or [])


def test_default_with_identity_keeps_implied_features(pond):
    """The defaults follow-up protocol upgrade must enumerate the
    legacy-implied features (identityColumns), not erase them."""
    from athena_delta_lake_spark.delta.log import DeltaLog

    pond.sql(
        "CREATE TABLE lake.di ("
        " id BIGINT GENERATED ALWAYS AS IDENTITY,"
        " tag STRING DEFAULT 'x')"
    )
    proto = DeltaLog(pond.table_path("lake", "di")).snapshot().protocol
    feats = set(proto.get("writerFeatures") or [])
    assert {"allowColumnDefaults", "identityColumns"} <= feats
    pond.sql("INSERT INTO lake.di (tag) SELECT 'a'")
    r = pond.sql("SELECT id, tag FROM lake.di").first()
    assert r["id"] == 1 and r["tag"] == "a"


def test_generated_by_default_identity_rejected(pond):
    with pytest.raises(ValueError, match="BY DEFAULT"):
        pond.sql(
            "CREATE TABLE lake.bd (id BIGINT GENERATED BY DEFAULT AS IDENTITY, x INT)"
        )


def test_call_conflicting_args_rejected(pond):
    _mk(pond)
    with pytest.raises(ValueError, match="positional and named"):
        pond.sql("CALL vacuum('lake.t', 1.0, retention_hours => 2.0)")
    # negative literal arguments parse
    with pytest.raises(Exception):  # restore to negative version errors downstream
        pond.sql("CALL restore('lake.t', -1)")


def test_insert_by_name_fills_defaults(pond):
    pond.sql("CREATE TABLE lake.bn (id BIGINT, tag STRING DEFAULT 'n/a')")
    pond.sql("INSERT INTO lake.bn BY NAME SELECT 7 AS id")
    r = pond.sql("SELECT id, tag FROM lake.bn").first()
    assert (r["id"], r["tag"]) == (7, "n/a")


# ------------------------------------------------------------- CLONE routing


def test_sql_shallow_clone_and_divergence(pond):
    pond.sql("CREATE TABLE lake.cl_src AS SELECT id, id % 3 AS k FROM range(100)")
    pond.sql("INSERT INTO lake.cl_src SELECT id + 1000, 9 FROM range(10)")
    pond.sql("CREATE TABLE lake.cl_sh SHALLOW CLONE lake.cl_src")
    assert pond.sql("SELECT count(*) AS n FROM lake.cl_sh").first()["n"] == 110
    # the clone evolves independently of the source
    pond.sql("INSERT INTO lake.cl_sh SELECT id + 5000, 1 FROM range(5)")
    pond.sql("DELETE FROM lake.cl_src WHERE k = 9")
    assert pond.sql("SELECT count(*) AS n FROM lake.cl_sh").first()["n"] == 115
    assert pond.sql("SELECT count(*) AS n FROM lake.cl_src").first()["n"] == 100


def test_sql_deep_clone_time_travel(pond):
    pond.sql("CREATE TABLE lake.cl_tt AS SELECT id FROM range(50)")
    pond.sql("INSERT INTO lake.cl_tt SELECT id + 100 FROM range(25)")
    # no keyword -> DEEP clone; VERSION AS OF pins the snapshot
    pond.sql("CREATE TABLE lake.cl_v0 CLONE lake.cl_tt VERSION AS OF 0")
    assert pond.sql("SELECT count(*) AS n FROM lake.cl_v0").first()["n"] == 50
    # deep clone survives source deletion (storage isolation)
    import shutil

    from athena_delta_lake_spark.delta.log import DeltaLog

    shutil.rmtree(pond.table_path("lake", "cl_tt"))
    DeltaLog.clear_cache()
    assert pond.sql("SELECT count(*) AS n FROM lake.cl_v0").first()["n"] == 50


def test_sql_clone_collisions_both_directions(pond):
    pond.sql("CREATE TABLE lake.cl_a AS SELECT id FROM range(10)")
    pond.sql("CREATE TABLE lake.cl_b AS SELECT id FROM range(5)")
    with pytest.raises(ValueError, match="already exists"):
        pond.sql("CREATE TABLE lake.cl_b CLONE lake.cl_a")
    # IF NOT EXISTS: silent no-op, table untouched
    pond.sql("CREATE TABLE IF NOT EXISTS lake.cl_b CLONE lake.cl_a")
    assert pond.sql("SELECT count(*) AS n FROM lake.cl_b").first()["n"] == 5
    # OR REPLACE: replaces
    pond.sql("CREATE OR REPLACE TABLE lake.cl_b SHALLOW CLONE lake.cl_a")
    assert pond.sql("SELECT count(*) AS n FROM lake.cl_b").first()["n"] == 10
    # view-name collision refused
    pond.create_view("cl_view", "SELECT id FROM lake.cl_a")
    with pytest.raises(ValueError, match="view named"):
        pond.sql("CREATE TABLE lake.cl_view CLONE lake.cl_a")


# ------------------------- OPTIMIZE WHERE + retention properties (round 5)


def test_optimize_where_scopes_compaction(pond):
    pond.sql(
        "CREATE TABLE lake.ow PARTITIONED BY (k) AS "
        "SELECT id, CAST(id % 2 AS INT) AS k FROM range(40)"
    )
    for i in range(2):  # several small files per partition
        pond.sql(f"INSERT INTO lake.ow SELECT id + {100 * (i + 1)}, CAST(id % 2 AS INT) FROM range(10)")
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = pond.table_path("lake", "ow")
    before = {f.path for f in DeltaLog(path).snapshot().files}
    pond.sql("OPTIMIZE lake.ow WHERE k = 0")
    after = {f.path for f in DeltaLog(path).snapshot().files}
    # k=1 files untouched; k=0 partition compacted
    assert {p for p in before if "k=1" in p} == {p for p in after if "k=1" in p}
    assert {p for p in before if "k=0" in p} != {p for p in after if "k=0" in p}
    assert pond.sql("SELECT count(*) AS n FROM lake.ow").first()["n"] == 60


def test_optimize_where_rejects_complex_predicates(pond):
    pond.sql("CREATE TABLE lake.ow2 AS SELECT id FROM range(5)")
    with pytest.raises(ValueError, match="OPTIMIZE WHERE"):
        pond.sql("OPTIMIZE lake.ow2 WHERE id + 1 = length('ab')")


def test_vacuum_honors_retention_property(pond):
    import os
    import time

    pond.sql(
        "CREATE TABLE lake.vr AS SELECT id FROM range(10)"
    )
    pond.sql(
        "ALTER TABLE lake.vr SET TBLPROPERTIES "
        "('delta.deletedFileRetentionDuration' = 'interval 0 hours')"
    )
    pond.sql("DELETE FROM lake.vr WHERE id < 5")
    time.sleep(0.1)
    # no RETAIN clause: the table property (0 hours) applies, so the
    # removed files delete immediately
    res = pond.sql("VACUUM lake.vr").first()
    assert res["numFiles"] >= 1 and res["deleted"] == 1
    assert pond.sql("SELECT count(*) AS n FROM lake.vr").first()["n"] == 5


def test_retention_interval_parser():
    from athena_delta_lake_spark.delta.dml import retention_hours_from_interval

    assert retention_hours_from_interval("interval 7 days") == 168.0
    assert retention_hours_from_interval("INTERVAL 1 week") == 168.0
    assert retention_hours_from_interval("interval 30 minutes") == 0.5
    assert retention_hours_from_interval("interval 12 hours") == 12.0
    assert retention_hours_from_interval("7 days") is None
    assert retention_hours_from_interval(None) is None


def test_reorg_table_apply_purge(spark, tmp_path):
    """REORG TABLE t APPLY (PURGE): rewrites ONLY deletion-vector'd
    files (materializing the soft deletes), leaves DV-free files
    byte-identical, changes no logical rows, and the commit is
    dataChange=false (invisible to the change feed)."""
    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.dml import delete_mor

    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(100).selectExpr("id", "cast(id % 4 as int) as k"),
        path,
        partition_by=["k"],
    )
    delete_mor(spark, path, "id % 10 = 0 and k in (0, 2)")  # DVs on 2 parts
    t = DeltaTable(spark, path)
    before = {f.path: f for f in t.snapshot().files}
    dv_paths = {p for p, f in before.items() if f.deletion_vector}
    assert dv_paths  # premise: some files carry DVs
    pond = DeltaPond(spark, root)
    row = pond.sql("REORG TABLE lake.t APPLY (PURGE)").first()
    assert row["operation"] == "reorg_purge"
    assert int(row["files_removed"]) == len(dv_paths)
    after = {f.path: f for f in t.snapshot().files}
    # untouched DV-free files survive identically; no DVs remain
    for p, f in before.items():
        if p not in dv_paths:
            assert p in after
    assert not any(f.deletion_vector for f in after.values())
    # logical content unchanged
    assert t.to_df().count() == 90
    assert t.to_df().filter("id % 10 = 0 and k in (0, 2)").count() == 0
    # dataChange=false: the REORG version emits no changes
    v = t.version()
    assert t.table_changes(v, v).count() == 0
    # idempotent: nothing left to purge
    assert int(
        pond.sql("REORG TABLE lake.t APPLY (PURGE)").first()["files_removed"]
    ) == 0


def test_reorg_purge_preserves_row_ids(spark, tmp_path):
    """REORG must carry materialized row ids through the rewrite exactly
    like OPTIMIZE does — surviving rows keep their stable _row_id."""
    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.delta.dml import delete_mor, reorg_purge
    from athena_delta_lake_spark.delta.writer import enable_row_tracking

    path = str(tmp_path / "rt")
    write_delta(spark.range(40).selectExpr("id"), path)
    enable_row_tracking(path)
    t = DeltaTable(spark, path)
    before = {
        r["id"]: r["_row_id"]
        for r in t.to_df_with_row_ids().select("id", "_row_id").collect()
    }
    delete_mor(spark, path, "id % 4 = 0")
    reorg_purge(spark, path)
    after = {
        r["id"]: r["_row_id"]
        for r in t.to_df_with_row_ids().select("id", "_row_id").collect()
    }
    assert set(after) == {i for i in range(40) if i % 4 != 0}
    assert all(after[i] == before[i] for i in after)  # ids survived
    assert len(set(after.values())) == len(after)  # still unique


def test_reorg_where_scopes_purge(spark, tmp_path):
    """REORG TABLE t WHERE pred APPLY (PURGE): only DV'd files matching
    the predicate rewrite; DV'd files outside the scope keep their DVs."""
    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.dml import delete_mor

    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(100).selectExpr("id", "cast(id % 4 as int) as k"),
        path,
        partition_by=["k"],
    )
    delete_mor(spark, path, "id % 5 = 0")  # DVs across all partitions
    pond = DeltaPond(spark, root)
    row = pond.sql("REORG TABLE lake.t WHERE k = 1 APPLY (PURGE)").first()
    assert int(row["files_removed"]) >= 1
    snap = DeltaTable(spark, path).snapshot()
    for f in snap.files:
        has_dv = f.deletion_vector is not None
        in_scope = f.partition_values.get("k") == "1"
        assert not (in_scope and has_dv)  # scoped partition fully purged
    # other partitions keep their DVs (untouched by the scoped REORG)
    assert any(
        f.deletion_vector
        for f in snap.files
        if f.partition_values.get("k") != "1"
    )
    assert DeltaTable(spark, path).to_df().count() == 80


def test_create_table_cluster_by(spark, tmp_path):
    """CREATE TABLE ... CLUSTER BY (Spark 4 syntax) persists the liquid
    clustering policy in the delta.clustering domain; a plain OPTIMIZE
    re-clusters by it, and SHOW CREATE TABLE renders it back."""
    import json

    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql("CREATE TABLE lake.c1 (id BIGINT, k INT) CLUSTER BY (id, k)")
    dm = DeltaLog(f"{root}/lake/c1").snapshot().domain_metadata
    assert json.loads(dm["delta.clustering"])["clusteringColumns"] == ["id", "k"]
    pond.sql(
        "CREATE TABLE lake.c2 CLUSTER BY (k) AS "
        "SELECT id, CAST(id % 5 AS INT) AS k FROM range(100)"
    )
    dm2 = DeltaLog(f"{root}/lake/c2").snapshot().domain_metadata
    assert json.loads(dm2["delta.clustering"])["clusteringColumns"] == ["k"]
    assert pond.sql("SELECT count(*) AS n FROM lake.c2").first()["n"] == 100
    # plain OPTIMIZE re-clusters by the remembered policy (no explicit
    # ZORDER) and leaves content unchanged
    pond.sql("INSERT INTO lake.c2 SELECT id, CAST(id % 5 AS INT) FROM range(100, 120)")
    pond.sql("OPTIMIZE lake.c2")
    assert pond.sql("SELECT count(*) AS n FROM lake.c2").first()["n"] == 120
    ddl = pond.sql("SHOW CREATE TABLE lake.c2").first()[0]
    assert "CLUSTER BY (k)" in ddl
    # CLUSTER BY and PARTITIONED BY both parse; mixing is the writer's call
    pond.sql(
        "CREATE TABLE lake.c3 (id BIGINT, k INT) PARTITIONED BY (k)"
    )
    assert "delta.clustering" not in DeltaLog(
        f"{root}/lake/c3"
    ).snapshot().domain_metadata


def test_alter_table_cluster_by(spark, tmp_path):
    """ALTER TABLE ... CLUSTER BY (cols) sets the policy; CLUSTER BY NONE
    retires it; unknown columns refuse."""
    import json

    import pytest

    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t AS SELECT id, CAST(id % 5 AS INT) AS k "
        "FROM range(60)"
    )
    path = f"{root}/lake/t"
    pond.sql("ALTER TABLE lake.t CLUSTER BY (k, id)")
    dm = DeltaLog(path).snapshot().domain_metadata
    assert json.loads(dm["delta.clustering"])["clusteringColumns"] == ["k", "id"]
    # OPTIMIZE picks the policy up and content is stable
    pond.sql("OPTIMIZE lake.t")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 60
    assert "CLUSTER BY (k, id)" in pond.sql("SHOW CREATE TABLE lake.t").first()[0]
    pond.sql("ALTER TABLE lake.t CLUSTER BY NONE")
    assert "delta.clustering" not in DeltaLog(path).snapshot().domain_metadata
    with pytest.raises(ValueError, match="not in schema"):
        pond.sql("ALTER TABLE lake.t CLUSTER BY (nope)")


def test_sql_check_constraints_route(spark, tmp_path):
    """ADD/DROP CONSTRAINT through pond.sql: validation on add, DML
    enforcement afterwards, IF EXISTS tolerance on drop."""
    import pytest

    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql("CREATE TABLE lake.t AS SELECT id FROM range(10)")
    row = pond.sql(
        "ALTER TABLE lake.t ADD CONSTRAINT small CHECK (id < 100)"
    ).first()
    assert row["operation"] == "add_constraint" and row["name"] == "small"
    with pytest.raises(ValueError, match="small"):
        pond.sql("INSERT INTO lake.t VALUES (500)")  # violates
    with pytest.raises(ValueError, match="violated"):
        # adding a constraint existing rows break must refuse
        pond.sql("ALTER TABLE lake.t ADD CONSTRAINT neg CHECK (id < 5)")
    pond.sql("ALTER TABLE lake.t DROP CONSTRAINT small")
    pond.sql("INSERT INTO lake.t VALUES (500)")  # now fine
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 11
    with pytest.raises(ValueError, match="no such constraint"):
        pond.sql("ALTER TABLE lake.t DROP CONSTRAINT small")
    r = pond.sql("ALTER TABLE lake.t DROP CONSTRAINT IF EXISTS small").first()
    assert r["operation"] == "drop_constraint_skipped"


def test_alter_column_comment_nullability_default(spark, tmp_path):
    import pytest

    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t AS SELECT id, "
        "CASE WHEN id % 2 = 0 THEN NULL ELSE id END AS v FROM range(10)"
    )
    path = f"{root}/lake/t"

    pond.sql("ALTER TABLE lake.t ALTER COLUMN v COMMENT 'maybe null'")
    fld = {f.name: f for f in DeltaLog(path).snapshot().schema.fields}
    assert fld["v"].metadata.get("comment") == "maybe null"
    assert "maybe null" in pond.sql("SHOW CREATE TABLE lake.t").first()[0]

    # SET NOT NULL refuses while NULLs exist, works after they go
    with pytest.raises(ValueError, match="NULL"):
        pond.sql("ALTER TABLE lake.t ALTER COLUMN v SET NOT NULL")
    pond.sql("DELETE FROM lake.t WHERE v IS NULL")
    pond.sql("ALTER TABLE lake.t ALTER COLUMN v SET NOT NULL")
    fld = {f.name: f for f in DeltaLog(path).snapshot().schema.fields}
    assert fld["v"].nullable is False
    pond.sql("ALTER TABLE lake.t ALTER COLUMN v DROP NOT NULL")
    fld = {f.name: f for f in DeltaLog(path).snapshot().schema.fields}
    assert fld["v"].nullable is True

    # SET DEFAULT governs future inserts by name; DROP DEFAULT stops that
    pond.sql("ALTER TABLE lake.t ALTER COLUMN v SET DEFAULT 42")
    pond.sql("INSERT INTO lake.t (id) VALUES (777)")
    got = pond.sql("SELECT v FROM lake.t WHERE id = 777").first()["v"]
    assert got == 42
    feats = set(
        DeltaLog(path).snapshot().protocol.get("writerFeatures") or []
    )
    assert "allowColumnDefaults" in feats
    pond.sql("ALTER TABLE lake.t ALTER COLUMN v DROP DEFAULT")
    fld = {f.name: f for f in DeltaLog(path).snapshot().schema.fields}
    assert "CURRENT_DEFAULT" not in (fld["v"].metadata or {})


def test_alter_column_position(spark, tmp_path):
    """ALTER COLUMN ... FIRST / AFTER x: metadata-only reorder; reads,
    INSERT by position and time travel all follow the new order."""
    import pytest

    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t AS SELECT id AS a, id * 2 AS b, id * 3 AS c "
        "FROM range(5)"
    )
    path = f"{root}/lake/t"
    pond.sql("ALTER TABLE lake.t ALTER COLUMN c FIRST")
    assert [f.name for f in DeltaLog(path).snapshot().schema.fields] == [
        "c", "a", "b",
    ]
    pond.sql("ALTER TABLE lake.t ALTER COLUMN c AFTER a")
    assert [f.name for f in DeltaLog(path).snapshot().schema.fields] == [
        "a", "c", "b",
    ]
    row = pond.sql("SELECT * FROM lake.t WHERE a = 2").first()
    assert (row["a"], row["c"], row["b"]) == (2, 6, 4)
    assert list(row.asDict()) == ["a", "c", "b"]
    # INSERT by position follows the CURRENT order
    pond.sql("INSERT INTO lake.t VALUES (100, 300, 200)")
    got = pond.sql("SELECT a, b, c FROM lake.t WHERE a = 100").first()
    assert (got["a"], got["b"], got["c"]) == (100, 200, 300)
    with pytest.raises(ValueError, match="no such column"):
        pond.sql("ALTER TABLE lake.t ALTER COLUMN a AFTER zz")


def test_add_columns_with_position(spark, tmp_path):
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql("CREATE TABLE lake.t AS SELECT id AS a, id * 2 AS b FROM range(4)")
    pond.sql("ALTER TABLE lake.t ADD COLUMNS (x INT AFTER a, y STRING FIRST)")
    names = [f.name for f in DeltaLog(f"{root}/lake/t").snapshot().schema.fields]
    assert names == ["y", "a", "x", "b"]
    row = pond.sql("SELECT * FROM lake.t WHERE a = 1").first()
    assert list(row.asDict()) == ["y", "a", "x", "b"]
    assert row["x"] is None and row["y"] is None and row["b"] == 2


def test_create_or_replace_table(spark, tmp_path):
    """CREATE OR REPLACE TABLE: schema/partitioning/data replaced in one
    commit, history preserved; bare REPLACE TABLE demands existence."""
    import pytest

    from athena_delta_lake_spark import DeltaTable
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    with pytest.raises(ValueError, match="does not exist"):
        pond.sql("REPLACE TABLE lake.t AS SELECT 1 AS x")
    # OR CREATE tolerates absence (creates)
    pond.sql("CREATE OR REPLACE TABLE lake.t AS SELECT id, id * 2 AS v FROM range(10)")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 10
    # full replace: different schema AND partitioning
    pond.sql(
        "CREATE OR REPLACE TABLE lake.t PARTITIONED BY (k) AS "
        "SELECT id, CAST(id % 3 AS INT) AS k, 'x' AS s FROM range(6)"
    )
    t = DeltaTable(spark, f"{root}/lake/t")
    assert [f.name for f in t.schema().fields] == ["id", "k", "s"]
    assert t.partition_columns() == ["k"]
    assert t.to_df().count() == 6
    # old version still time-travels
    assert t.to_df(version=0).count() == 10
    # bare REPLACE now works (table exists)
    pond.sql("REPLACE TABLE lake.t AS SELECT 7 AS only_col")
    assert pond.sql("SELECT only_col FROM lake.t").first()["only_col"] == 7
    # column-definition form replaces with an empty declared schema
    pond.sql("CREATE OR REPLACE TABLE lake.t (a BIGINT, b STRING)")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 0
    assert [f.name for f in DeltaTable(spark, f"{root}/lake/t").schema().fields] == ["a", "b"]
    # a view name still refuses
    pond.sql("CREATE VIEW vw AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="view"):
        pond.sql("CREATE OR REPLACE TABLE lake.vw AS SELECT 1 AS x")


def test_truncate_table(spark, tmp_path):
    """TRUNCATE TABLE: all rows gone, zero data I/O (remove-only commit),
    schema/history preserved, CDF stream sees the deletes derivably."""
    import json
    import os

    from athena_delta_lake_spark import DeltaTable
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t AS SELECT id, CAST(id % 3 AS INT) AS k "
        "FROM range(30)"
    )
    path = f"{root}/lake/t"
    row = pond.sql("TRUNCATE TABLE lake.t").first()
    assert row["operation"] == "truncate" and int(row["files_removed"]) >= 1
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 0
    t = DeltaTable(spark, path)
    assert [f.name for f in t.schema().fields] == ["id", "k"]
    assert t.to_df(version=0).count() == 30  # history intact
    # the truncate commit is remove-only: no add actions, no data writes
    last = sorted(
        f for f in os.listdir(f"{path}/_delta_log") if f.endswith(".json")
    )[-1]
    actions = [json.loads(l) for l in open(f"{path}/_delta_log/{last}")]
    assert any("remove" in a for a in actions)
    assert not any("add" in a for a in actions)
    # idempotent-ish: truncating an empty table is a no-op
    r2 = pond.sql("TRUNCATE TABLE lake.t").first()
    assert int(r2["files_removed"]) == 0
    # table stays writable
    pond.sql("INSERT INTO lake.t VALUES (100, 1)")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 1


def test_insert_and_ctas_with_group_by(spark, tmp_path):
    """Regression: query-span recovery must survive aggregate-only and
    sorted queries — the Aggregate/Sort plan origins start at GROUP/ORDER
    and no plan node carries the SELECT keyword (it lives in expression
    origins)."""
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.src AS SELECT id, CAST(id % 3 AS INT) AS k "
        "FROM range(30)"
    )
    pond.sql("CREATE TABLE lake.agg (k INT, n BIGINT)")
    pond.sql(
        "INSERT INTO lake.agg SELECT k, count(*) AS n FROM lake.src "
        "GROUP BY k"
    )
    assert sorted(
        (r["k"], r["n"]) for r in pond.sql("SELECT * FROM lake.agg").collect()
    ) == [(0, 10), (1, 10), (2, 10)]
    pond.sql(
        "CREATE TABLE lake.agg2 AS SELECT k, count(*) AS n FROM lake.src "
        "GROUP BY k ORDER BY k DESC"
    )
    assert pond.sql("SELECT count(*) AS n FROM lake.agg2").first()["n"] == 3
    pond.sql(
        "CREATE OR REPLACE TABLE lake.agg AS WITH c AS "
        "(SELECT k FROM lake.src) SELECT k, count(*) AS n FROM c GROUP BY k"
    )
    assert pond.sql("SELECT count(*) AS n FROM lake.agg").first()["n"] == 3


def test_show_create_table_renders_defaults_generated_identity(spark, tmp_path):
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t ("
        "  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 2),"
        "  v DOUBLE NOT NULL,"
        "  v2 DOUBLE GENERATED ALWAYS AS (v * 2),"
        "  s STRING DEFAULT 'none'"
        ")"
    )
    ddl = pond.sql("SHOW CREATE TABLE lake.t").first()[0]
    assert "GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 2)" in ddl
    assert "GENERATED ALWAYS AS (v * 2)" in ddl
    assert "DEFAULT 'none'" in ddl
    assert "v DOUBLE NOT NULL" in ddl


def test_replace_table_resets_constraints_properties_and_domains(spark, tmp_path):
    """REPLACE resets what the statement does not re-specify (delta-spark
    parity): prior CHECK constraints must not block (or haunt) the new
    schema, prior TBLPROPERTIES are gone, and a stale clustering domain
    must not crash the next OPTIMIZE on dropped columns."""
    import json

    import pytest

    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t CLUSTER BY (k) AS "
        "SELECT id, CAST(id % 3 AS INT) AS k FROM range(30)"
    )
    pond.sql("ALTER TABLE lake.t ADD CONSTRAINT small CHECK (id < 100)")
    pond.sql("ALTER TABLE lake.t SET TBLPROPERTIES ('user.prop' = 'x')")
    path = f"{root}/lake/t"
    # the new schema has NEITHER id NOR k: a surviving constraint would
    # crash the replace, a surviving clustering domain the next OPTIMIZE
    pond.sql("CREATE OR REPLACE TABLE lake.t AS SELECT 'a' AS name")
    snap = DeltaLog(path).snapshot()
    cfg = snap.metadata.get("configuration") or {}
    assert not any(k.startswith("delta.constraints.") for k in cfg)
    assert "user.prop" not in cfg
    assert "delta.clustering" not in snap.domain_metadata
    assert "CLUSTER BY" not in pond.sql("SHOW CREATE TABLE lake.t").first()[0]
    pond.sql("OPTIMIZE lake.t")  # must not reference the dropped column k
    # the constraint is really gone: a row the OLD constraint would have
    # rejected (if columns matched) inserts fine, and re-adding works
    pond.sql("INSERT INTO lake.t VALUES ('b')")
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 2
    # re-specified metadata DOES apply
    pond.sql(
        "CREATE OR REPLACE TABLE lake.t CLUSTER BY (n2) AS "
        "SELECT id AS n2 FROM range(5)"
    )
    dm = DeltaLog(path).snapshot().domain_metadata
    assert json.loads(dm["delta.clustering"])["clusteringColumns"] == ["n2"]


def test_span_fallback_ignores_comments_and_literals(spark, tmp_path):
    """The query-span keyword fallback must not anchor at SELECT/VALUES
    keywords inside comments or string literals."""
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.src AS SELECT id, CAST(id % 3 AS INT) AS k "
        "FROM range(12)"
    )
    pond.sql("CREATE TABLE lake.agg (k INT, n BIGINT)")
    pond.sql(
        "INSERT INTO lake.agg SELECT /* old VALUES */ k, count(*) AS n "
        "FROM lake.src GROUP BY k"
    )
    assert pond.sql("SELECT count(*) AS n FROM lake.agg").first()["n"] == 3
    pond.sql(
        "INSERT INTO lake.agg SELECT k, count(*) -- TABLE trailer\n"
        "FROM lake.src GROUP BY k"
    )
    assert pond.sql("SELECT count(*) AS n FROM lake.agg").first()["n"] == 6


def test_describe_detail_clustering_columns(spark, tmp_path):
    from athena_delta_lake_spark import DeltaTable
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t CLUSTER BY (k) AS "
        "SELECT id, CAST(id % 2 AS INT) AS k FROM range(8)"
    )
    d = DeltaTable(spark, f"{root}/lake/t").detail()
    assert d["clusteringColumns"] == ["k"]
    pond.sql("ALTER TABLE lake.t CLUSTER BY NONE")
    d2 = DeltaTable(spark, f"{root}/lake/t").detail()
    assert d2["clusteringColumns"] == []


def test_create_table_tblproperties_and_comment(spark, tmp_path):
    """TBLPROPERTIES and COMMENT in CREATE TABLE / CTAS land in the
    metaData (regression: silently dropped); delta.columnMapping.mode in
    TBLPROPERTIES routes through the dedicated mapping-enable DDL; the
    comment survives later schema evolution; REPLACE resets both."""
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.t (id BIGINT) TBLPROPERTIES "
        "('delta.enableChangeDataFeed'='true', 'u.p'='1') COMMENT 'my table'"
    )
    md = DeltaLog(f"{root}/lake/t").snapshot().metadata
    assert md["configuration"]["delta.enableChangeDataFeed"] == "true"
    assert md["configuration"]["u.p"] == "1"
    assert md["description"] == "my table"
    pond.sql("CREATE TABLE lake.t2 TBLPROPERTIES ('a'='2') COMMENT 'c2' AS SELECT 1 AS x")
    pond.sql("ALTER TABLE lake.t2 ADD COLUMNS (y INT)")
    md2 = DeltaLog(f"{root}/lake/t2").snapshot().metadata
    assert md2["description"] == "c2"  # survives schema evolution
    assert md2["configuration"]["a"] == "2"
    # mapping at creation: ids + physical names stamped, feature declared
    pond.sql(
        "CREATE TABLE lake.t3 (id BIGINT) TBLPROPERTIES "
        "('delta.columnMapping.mode'='name')"
    )
    snap3 = DeltaLog(f"{root}/lake/t3").snapshot()
    assert snap3.metadata["configuration"]["delta.columnMapping.mode"] == "name"
    assert "delta.columnMapping.physicalName" in str(snap3.metadata["schemaString"])
    assert "columnMapping" in (snap3.protocol.get("readerFeatures") or [])
    # REPLACE resets unspecified comment/properties
    pond.sql("CREATE OR REPLACE TABLE lake.t2 AS SELECT 1 AS z")
    md2b = DeltaLog(f"{root}/lake/t2").snapshot().metadata
    assert md2b.get("description") is None
    assert "a" not in (md2b.get("configuration") or {})


def test_create_table_feature_properties_route_properly(spark, tmp_path):
    """Feature-bearing TBLPROPERTIES at creation must go through their
    dedicated DDL paths: row tracking declares its features and backfills
    ids; constraints validate and declare checkConstraints; mode 'none'
    is the legal no-op."""
    import pytest

    from athena_delta_lake_spark import DeltaTable
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.rt TBLPROPERTIES ('delta.enableRowTracking'='true') "
        "AS SELECT id FROM range(20)"
    )
    snap = DeltaLog(f"{root}/lake/rt").snapshot()
    feats = set(snap.protocol.get("writerFeatures") or [])
    assert {"rowTracking", "domainMetadata"} <= feats
    assert "delta.rowTracking" in snap.domain_metadata
    ids = [
        r["_row_id"]
        for r in DeltaTable(spark, f"{root}/lake/rt").to_df_with_row_ids().collect()
    ]
    assert len(set(ids)) == 20
    pond.sql(
        "CREATE TABLE lake.ck TBLPROPERTIES "
        "('delta.constraints.pos'='id >= 0') AS SELECT id FROM range(5)"
    )
    snap2 = DeltaLog(f"{root}/lake/ck").snapshot()
    assert snap2.metadata["configuration"]["delta.constraints.pos"] == "id >= 0"
    with pytest.raises(ValueError, match="pos"):
        pond.sql("INSERT INTO lake.ck VALUES (-1)")
    pond.sql(
        "CREATE TABLE lake.nm (id BIGINT) TBLPROPERTIES "
        "('delta.columnMapping.mode'='none')"
    )  # legal no-op
    row = pond.sql("DESCRIBE DETAIL lake.rt").first()
    assert row["clusteringColumns"] == []
