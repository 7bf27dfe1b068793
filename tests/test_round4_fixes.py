"""Round-4 defect regressions (ADVICE.md round 3):

1. protocol upgrade enumerates legacy READER-implied features
   (minReaderVersion=2 -> columnMapping) when moving to v3 readerFeatures;
2. pond-bound bare-name temp views are re-bound every sql() call, so
   SELECT after routed DML on the same name is never stale;
3. SHOW TABLES IN <session db> falls through to spark.sql instead of
   raising FileNotFoundError; plain SHOW TABLES includes session views;
4. CREATE TABLE / CTAS with 1- or 3-part names defer to spark.sql;
5. bare-name DML defers to spark.sql when a USER temp view shadows the
   name (read/write precedence consistency).
"""

from __future__ import annotations

import pytest

from athena_delta_lake_spark.catalog import DeltaPond
from athena_delta_lake_spark.delta.writer import _protocol_upgrade_action


@pytest.fixture
def pond(spark, tmp_path):
    p = DeltaPond(spark, str(tmp_path / "pond"))
    p.sql("CREATE SCHEMA lake")
    return p


# ------------------------------------------------- 1. reader-implied features


def test_upgrade_legacy_reader_protocol_keeps_column_mapping():
    # externally-written legacy protocol: column mapping implied by
    # minReaderVersion=2 / minWriterVersion=5, no feature lists
    prior = {"minReaderVersion": 2, "minWriterVersion": 5}
    act = _protocol_upgrade_action(prior, reader_features=("typeWidening",),
                                   writer_features=("typeWidening",))
    proto = act["protocol"]
    assert proto["minReaderVersion"] == 3
    assert "columnMapping" in proto["readerFeatures"]
    assert "typeWidening" in proto["readerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]


def test_upgrade_writer_only_keeps_legacy_reader_version():
    # adding only a writer feature must NOT invent a readerFeatures list:
    # minReaderVersion=2 keeps implying columnMapping by itself
    prior = {"minReaderVersion": 2, "minWriterVersion": 5}
    act = _protocol_upgrade_action(prior, writer_features=("deletionVectors",))
    proto = act["protocol"]
    # deletionVectors is actually reader+writer, but pass it writer-only
    # here to exercise the branch
    assert proto["minReaderVersion"] == 2
    assert "readerFeatures" not in proto
    assert "columnMapping" in proto["writerFeatures"]


def test_upgrade_explicit_reader_features_not_reimplied():
    # a prior v3 protocol that deliberately lists only 'deletionVectors'
    # must not get columnMapping injected (nothing is implied at v3)
    prior = {
        "minReaderVersion": 3,
        "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }
    act = _protocol_upgrade_action(prior, reader_features=("v2Checkpoint",),
                                   writer_features=("v2Checkpoint",))
    assert "columnMapping" not in act["protocol"]["readerFeatures"]


# --------------------------------------------- 2. bare-name view freshness


def test_bare_name_select_sees_routed_dml(pond):
    pond.sql("CREATE TABLE lake.ev6 AS SELECT id FROM range(5)")
    assert pond.sql("SELECT count(*) AS n FROM ev6").first()["n"] == 5
    pond.sql("INSERT INTO ev6 SELECT id + 100 FROM range(3)")
    # the pond-bound view must re-bind: 8 rows, not the pinned 5
    assert pond.sql("SELECT count(*) AS n FROM ev6").first()["n"] == 8
    pond.sql("DELETE FROM ev6 WHERE id >= 100")
    assert pond.sql("SELECT count(*) AS n FROM ev6").first()["n"] == 5


# ------------------------------------------------- 3. SHOW TABLES routing


def test_show_tables_in_session_db_falls_through(pond):
    df = pond.sql("SHOW TABLES IN default")  # session catalog database
    assert df.count() >= 0  # executes via spark.sql, no FileNotFoundError


def test_show_tables_includes_session_temp_views(pond):
    pond.sql("CREATE TABLE lake.sv1 AS SELECT 1 AS x")
    pond.spark.range(1).createOrReplaceTempView("r4_user_view")
    try:
        names = {r.tableName for r in pond.sql("SHOW TABLES").collect()}
        assert "sv1" in names
        assert "r4_user_view" in names
    finally:
        pond.spark.catalog.dropTempView("r4_user_view")


# --------------------------------------- 4. non-pond CREATE TABLE name shapes


def test_create_table_one_part_defers_to_session_catalog(pond):
    pond.spark.sql("DROP TABLE IF EXISTS r4_sess_t")
    try:
        pond.sql("CREATE TABLE r4_sess_t (a INT) USING parquet")
        assert pond.spark.catalog.tableExists("r4_sess_t")
    finally:
        pond.spark.sql("DROP TABLE IF EXISTS r4_sess_t")


def test_ctas_three_part_defers_to_session_catalog(pond):
    pond.spark.sql("DROP TABLE IF EXISTS spark_catalog.default.r4_sess_c")
    try:
        pond.sql(
            "CREATE TABLE spark_catalog.default.r4_sess_c USING parquet "
            "AS SELECT 1 AS x"
        )
        assert pond.spark.catalog.tableExists("default.r4_sess_c")
    finally:
        pond.spark.sql("DROP TABLE IF EXISTS spark_catalog.default.r4_sess_c")


# ------------------------------------------- 5. DML vs shadowing temp view


def test_dml_defers_when_user_temp_view_shadows(pond):
    pond.sql("CREATE TABLE lake.ev5 AS SELECT id FROM range(5)")
    pond.spark.range(100, 103).toDF("id").createOrReplaceTempView("ev5")
    try:
        # read side: the user view shadows the pond table
        assert pond.sql("SELECT count(*) AS n FROM ev5").first()["n"] == 3
        # write side must agree: defer to spark.sql, which rejects
        # INSERT into a temp view instead of silently writing the pond
        with pytest.raises(Exception):
            pond.sql("INSERT INTO ev5 SELECT 999")
        assert (
            pond.sql("SELECT count(*) AS n FROM lake.ev5").first()["n"] == 5
        )
    finally:
        pond.spark.catalog.dropTempView("ev5")


def test_dml_proceeds_on_pond_bound_view(pond):
    pond.sql("CREATE TABLE lake.ev7 AS SELECT id FROM range(4)")
    pond.sql("SELECT * FROM ev7").collect()  # pond binds the bare view
    pond.sql("INSERT INTO ev7 SELECT 999")  # NOT a shadow: DML proceeds
    assert pond.sql("SELECT count(*) AS n FROM lake.ev7").first()["n"] == 5


# ------------------------------------- MERGE touched-file cap (driver bound)


def test_merge_touched_file_cap(spark, tmp_path, monkeypatch):
    from athena_delta_lake_spark.delta import write_delta
    from athena_delta_lake_spark.delta import dml
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "cap_tbl")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "id long, v double"
    ).repartition(8)
    write_delta(df, path)
    n_files = len(DeltaLog(path).snapshot().files)
    assert n_files >= 4

    src = spark.createDataFrame(
        [(i, -1.0) for i in range(40)], "id long, v double"
    )
    monkeypatch.setattr(dml, "_MERGE_TOUCHED_FILES_CAP", 2)
    with pytest.raises(RuntimeError, match="touches more than 2 data files"):
        dml.merge_upsert(spark, path, src, ["id"])
    # failed fast BEFORE any commit: table unchanged
    assert DeltaLog(path).snapshot().version == 0

    monkeypatch.setattr(dml, "_MERGE_TOUCHED_FILES_CAP", 1_000_000)
    dml.merge_upsert(spark, path, src, ["id"])
    from athena_delta_lake_spark.delta import DeltaTable

    rows = DeltaTable(spark, path).to_df().collect()
    assert len(rows) == 40 and all(r["v"] == -1.0 for r in rows)
