"""Named views + DESCRIBE HISTORY through pond.sql (round-4 UX gaps).

Views persist as SQL text in the pond's storage-layout catalog
(`<root>/_pond_views.json`) and are re-resolved on every reference, so
they always read the current table snapshot. DESCRIBE HISTORY is
Delta-specific syntax recognized before Spark's parser.
"""

from __future__ import annotations

import pytest

from athena_delta_lake_spark.catalog import DeltaPond


@pytest.fixture
def pond(spark, tmp_path):
    p = DeltaPond(spark, str(tmp_path / "pond"))
    p.sql("CREATE SCHEMA lake")
    p.sql(
        "CREATE TABLE lake.t PARTITIONED BY (ds) AS "
        "SELECT id, CAST(id * 2 AS DOUBLE) AS v, "
        "CASE WHEN id < 5 THEN 'a' ELSE 'b' END AS ds FROM range(10)"
    )
    return p


# ------------------------------------------------------------------- views


def test_create_select_drop_view(pond):
    pond.sql("CREATE VIEW big AS SELECT id, v FROM lake.t WHERE v >= 10")
    assert pond.sql("SELECT count(*) AS n FROM big").first()["n"] == 5
    # projection through the view
    assert pond.sql("SELECT max(v) AS m FROM big").first()["m"] == 18.0
    pond.sql("DROP VIEW big")
    assert "big" not in pond.list_views()


def test_view_reads_fresh_snapshot_after_dml(pond):
    pond.sql("CREATE VIEW vv AS SELECT * FROM lake.t")
    assert pond.sql("SELECT count(*) AS n FROM vv").first()["n"] == 10
    pond.sql("INSERT INTO lake.t SELECT id + 100, 0.0, 'c' FROM range(4)")
    # the view's defining SQL re-resolves: 14 rows, never the pinned 10
    assert pond.sql("SELECT count(*) AS n FROM vv").first()["n"] == 14
    pond.sql("DELETE FROM lake.t WHERE ds = 'c'")
    assert pond.sql("SELECT count(*) AS n FROM vv").first()["n"] == 10


def test_view_persists_across_pond_instances(pond):
    pond.sql("CREATE VIEW lake.pv AS SELECT id FROM lake.t WHERE ds = 'a'")
    p2 = DeltaPond(pond.spark, pond.root)
    assert p2.sql("SELECT count(*) AS n FROM lake.pv").first()["n"] == 5


def test_view_on_view_and_cycle_detection(pond):
    pond.sql("CREATE VIEW v1 AS SELECT id, v FROM lake.t")
    pond.sql("CREATE VIEW v2 AS SELECT id FROM v1 WHERE v > 8")
    assert pond.sql("SELECT count(*) AS n FROM v2").first()["n"] == 5
    # forge a cycle by editing the stored definition (CREATE would reject
    # it eagerly at analysis time)
    views = pond._load_views()
    views["v1"] = "SELECT id, CAST(id AS DOUBLE) AS v FROM v2"
    pond._save_views(views)
    with pytest.raises(Exception, match="circular view reference"):
        pond.sql("SELECT * FROM v1").collect()


def test_create_view_variants(pond):
    pond.sql("CREATE VIEW cv AS SELECT id FROM lake.t")
    with pytest.raises(ValueError, match="already exists"):
        pond.sql("CREATE VIEW cv AS SELECT v FROM lake.t")
    pond.sql("CREATE VIEW IF NOT EXISTS cv AS SELECT v FROM lake.t")
    # unchanged: still selects id
    assert "id" in pond.sql("SELECT * FROM cv").columns
    pond.sql("CREATE OR REPLACE VIEW cv AS SELECT v FROM lake.t")
    assert pond.sql("SELECT * FROM cv").columns == ["v"]
    # broken defining query fails at CREATE, not at first SELECT
    with pytest.raises(Exception):
        pond.sql("CREATE VIEW broken AS SELECT nope FROM lake.t")
    assert "broken" not in pond.list_views()


def test_drop_view_semantics(pond):
    with pytest.raises(Exception):
        pond.sql("DROP VIEW never_was")
    # IF EXISTS on an unknown name: defers to spark.sql, which no-ops
    pond.sql("DROP VIEW IF EXISTS never_was")
    # temp views stay spark.sql's business
    pond.spark.range(3).createOrReplaceTempView("sess_v")
    pond.sql("DROP VIEW sess_v")
    assert not pond.spark.catalog.tableExists("sess_v")


def test_show_views(pond):
    pond.sql("CREATE VIEW lake.sv AS SELECT id FROM lake.t")
    pond.sql("CREATE VIEW bare_sv AS SELECT id FROM lake.t")
    rows = {(r.namespace, r.viewName) for r in pond.sql("SHOW VIEWS").collect()}
    assert ("lake", "sv") in rows and ("", "bare_sv") in rows
    only_lake = {r.viewName for r in pond.sql("SHOW VIEWS IN lake").collect()}
    assert only_lake == {"sv"}


# -------------------------------------------------------- DESCRIBE HISTORY


def test_describe_history(pond):
    pond.sql("INSERT INTO lake.t SELECT 99, 1.0, 'z'")
    pond.sql("DELETE FROM lake.t WHERE id = 99")
    df = pond.sql("DESCRIBE HISTORY lake.t")
    rows = df.collect()
    assert [r.version for r in rows] == [2, 1, 0]  # newest first
    ops = [r.operation for r in rows]
    assert ops[0] == "DELETE" and ops[1] in ("WRITE", "INSERT")
    assert df.columns == [
        "version",
        "timestamp",
        "operation",
        "operationParameters",
        "operationMetrics",
        "readVersion",
    ]
    # bare name + DESC abbreviation route too
    assert pond.sql("DESC HISTORY t").count() == 3
    # non-pond name: falls through to spark.sql and errors there
    with pytest.raises(Exception):
        pond.sql("DESCRIBE HISTORY nowhere.nothing")


# ----------------------------------- OPTIMIZE / VACUUM / DETAIL / RESTORE


def test_maintenance_sugar_statements(pond, tmp_path):
    # several small appends -> OPTIMIZE compacts them
    for i in range(3):
        pond.sql(f"INSERT INTO lake.t SELECT {200 + i}, 1.0, 'm'")
    r = pond.sql("OPTIMIZE lake.t").first()
    assert r["operation"] == "optimize"
    n_before = pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"]

    d = pond.sql("DESCRIBE DETAIL lake.t").first()
    assert d["format"] == "parquet" or d["format"] == "delta"
    assert d["numFiles"] >= 1 and d["version"] >= 4
    assert d["partitionColumns"] == ["ds"]

    # VACUUM DRY RUN: lists the compacted-away files, deletes nothing
    v = pond.sql("VACUUM lake.t RETAIN 0 HOURS DRY RUN").first()
    assert v["operation"] == "vacuum" and int(v["numFiles"]) >= 1
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == n_before

    # RESTORE TO VERSION AS OF 0 rewinds to the CTAS state
    r = pond.sql("RESTORE TABLE lake.t TO VERSION AS OF 0").first()
    assert r["operation"] == "restore"
    assert pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"] == 10

    # non-pond names fall through (and fail in spark.sql's parser)
    with pytest.raises(Exception):
        pond.sql("OPTIMIZE nowhere.nothing")


def test_show_tblproperties(pond):
    pond.sql(
        "ALTER TABLE lake.t SET TBLPROPERTIES "
        "('delta.appendOnly' = 'false', 'team' = 'data')"
    )
    props = {r.key: r.value for r in pond.sql("SHOW TBLPROPERTIES lake.t").collect()}
    assert props.get("team") == "data"
    one = pond.sql("SHOW TBLPROPERTIES lake.t ('team')").collect()
    assert len(one) == 1 and one[0].value == "data"
    assert pond.sql("SHOW TBLPROPERTIES lake.t ('nope')").count() == 0


def test_convert_to_delta_sql(pond, tmp_path):
    # a plain-parquet table living in the pond layout
    raw = f"{pond.root}/lake/rawpq"
    pond.spark.range(25).selectExpr("id", "id % 2 AS p").write.partitionBy(
        "p"
    ).parquet(raw)
    r = pond.sql("CONVERT TO DELTA lake.rawpq").first()
    assert r["operation"] == "convert_to_delta"
    # now a real Delta table: history + snapshot SQL both work
    assert pond.sql("DESCRIBE HISTORY lake.rawpq").first()["operation"] == "CONVERT"
    assert pond.sql("SELECT count(*) AS n FROM lake.rawpq WHERE p = 1").first()["n"] == 12
    # absolute-path form
    raw2 = str(tmp_path / "abs_pq")
    pond.spark.range(7).write.parquet(raw2)
    r = pond.sql(f"CONVERT TO DELTA parquet.`{raw2}`").first()
    assert r["operation"] == "convert_to_delta"


def test_show_columns(pond):
    cols = [r.col_name for r in pond.sql("SHOW COLUMNS IN lake.t").collect()]
    assert cols == ["id", "v", "ds"]


def test_dml_refuses_view_targets(pond):
    pond.sql("CREATE VIEW lake.tv AS SELECT id FROM lake.t")
    with pytest.raises(ValueError, match="is a view"):
        pond.sql("INSERT INTO lake.tv SELECT 1")
    with pytest.raises(ValueError, match="is a view"):
        pond.sql("DELETE FROM lake.tv WHERE id = 1")
    with pytest.raises(ValueError, match="is a view"):
        pond.sql("OPTIMIZE lake.tv")


def test_table_view_name_collisions_refused(pond):
    pond.sql("CREATE VIEW lake.cv9 AS SELECT id FROM lake.t")
    with pytest.raises(ValueError, match="view named"):
        pond.sql("CREATE TABLE lake.cv9 AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="view named"):
        pond.sql("CREATE TABLE lake.cv9 (a INT)")
    with pytest.raises(ValueError, match="table named"):
        pond.sql("CREATE VIEW lake.t AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="table named"):
        pond.sql("CREATE VIEW t AS SELECT 1 AS x")  # bare name, same table


def test_comment_on_table(pond):
    from athena_delta_lake_spark.delta.table import DeltaTable

    pond.sql("COMMENT ON TABLE lake.t IS 'orders-ish demo table'")
    path = pond.table_path("lake", "t")
    assert (
        DeltaTable(pond.spark, path).detail()["description"]
        == "orders-ish demo table"
    )
    # comment survives DML, clears with IS NULL
    pond.sql("INSERT INTO lake.t SELECT 55, 1.0, 'z'")
    assert DeltaTable(pond.spark, path).detail()["description"] is not None
    pond.sql("COMMENT ON TABLE lake.t IS NULL")
    assert DeltaTable(pond.spark, path).detail()["description"] is None


def test_create_table_like(pond):
    pond.sql(
        "ALTER TABLE lake.t SET TBLPROPERTIES ('delta.appendOnly' = 'false')"
    )
    r = pond.sql("CREATE TABLE lake.t2 LIKE lake.t").first()
    assert r["operation"] == "create_like"
    # empty, same schema + partitioning + properties
    assert pond.sql("SELECT count(*) AS n FROM lake.t2").first()["n"] == 0
    cols = [r.col_name for r in pond.sql("SHOW COLUMNS IN lake.t2").collect()]
    assert cols == ["id", "v", "ds"]
    d = pond.sql("DESCRIBE DETAIL lake.t2").first()
    assert d["partitionColumns"] == ["ds"]
    assert "delta.appendOnly" in d["properties"]
    # inserts land in the copied partitioning
    pond.sql("INSERT INTO lake.t2 SELECT 1, 2.0, 'a'")
    assert pond.sql("SELECT count(*) AS n FROM lake.t2").first()["n"] == 1
    # IF NOT EXISTS + existing -> skip; plain -> error
    assert (
        pond.sql("CREATE TABLE IF NOT EXISTS lake.t2 LIKE lake.t").first()[
            "operation"
        ]
        == "create_like_skipped"
    )
    with pytest.raises(ValueError, match="already exists"):
        pond.sql("CREATE TABLE lake.t2 LIKE lake.t")


def test_show_create_table(pond):
    pond.sql("COMMENT ON TABLE lake.t IS 'demo'")
    pond.sql("ALTER TABLE lake.t SET TBLPROPERTIES ('team' = 'data')")
    ddl = pond.sql("SHOW CREATE TABLE lake.t").first()["createtab_stmt"]
    assert "CREATE TABLE lake.t" in ddl
    assert "id BIGINT" in ddl and "v DOUBLE" in ddl and "ds STRING" in ddl
    assert "USING delta" in ddl
    assert "PARTITIONED BY (ds)" in ddl
    assert "COMMENT 'demo'" in ddl
    assert "'team' = 'data'" in ddl
    # the rendered DDL is actually re-runnable against a fresh schema
    pond.sql("CREATE SCHEMA lake2")
    pond.sql(ddl.replace("lake.t", "lake2.t"))
    cols = [r.col_name for r in pond.sql("SHOW COLUMNS IN lake2.t").collect()]
    assert cols == ["id", "v", "ds"]


def test_alter_view_as(pond):
    pond.sql("CREATE VIEW lake.av AS SELECT id FROM lake.t")
    assert pond.sql("SELECT * FROM lake.av").columns == ["id"]
    pond.sql("ALTER VIEW lake.av AS SELECT id, v FROM lake.t WHERE v > 10")
    df = pond.sql("SELECT * FROM lake.av")
    assert df.columns == ["id", "v"] and df.count() == 4
    # session temp views stay spark.sql's business
    pond.spark.range(2).createOrReplaceTempView("sess_av")
    pond.sql("ALTER VIEW sess_av AS SELECT 7 AS z")
    assert pond.spark.sql("SELECT * FROM sess_av").first()["z"] == 7
    pond.spark.catalog.dropTempView("sess_av")


def test_rename_table(pond):
    pond.sql("CREATE TABLE lake.rn AS SELECT id FROM range(9)")
    pond.sql("SELECT * FROM rn").collect()  # bind a bare pond view
    r = pond.sql("ALTER TABLE lake.rn RENAME TO lake.rn2").first()
    assert r["operation"] == "rename_table"
    assert "rn" not in pond.list_tables("lake")
    assert pond.sql("SELECT count(*) AS n FROM lake.rn2").first()["n"] == 9
    # DESCRIBE HISTORY travels with the directory (relative log paths)
    assert pond.sql("DESCRIBE HISTORY lake.rn2").count() >= 1
    # old name is really gone, incl. the stale bound view
    with pytest.raises(Exception):
        pond.sql("SELECT * FROM lake.rn").collect()
    # collision refusals
    pond.sql("CREATE TABLE lake.rn3 AS SELECT 1 AS x")
    with pytest.raises(ValueError, match="already exists"):
        pond.sql("ALTER TABLE lake.rn2 RENAME TO lake.rn3")


def test_rename_view(pond):
    pond.sql("CREATE VIEW lake.rv AS SELECT id FROM lake.t")
    pond.sql("ALTER VIEW lake.rv RENAME TO lake.rv2")
    assert "lake.rv2" in pond.list_views() and "lake.rv" not in pond.list_views()
    assert pond.sql("SELECT count(*) AS n FROM lake.rv2").first()["n"] == 10
