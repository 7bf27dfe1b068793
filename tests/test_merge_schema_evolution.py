"""MERGE WITH SCHEMA EVOLUTION (round 5): source-only columns widen the
target schema IN THE SAME COMMIT (metaData action rides the merge commit;
old files read NULL for new columns), for copy-on-write and merge-on-read,
plain and column-mapped tables, with Delta's UPDATE SET * rule for columns
the source lacks. Plus INSERT-time evolution via the autoMerge conf."""

from __future__ import annotations

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.catalog import DeltaPond
from athena_delta_lake_spark.delta.dml import merge_upsert, merge_upsert_mor
from athena_delta_lake_spark.delta.log import DeltaLog


@pytest.fixture
def tbl(spark, tmp_path):
    path = str(tmp_path / "se")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ),
        path,
    )
    return path


def test_cow_evolution_single_commit(spark, tbl):
    src = spark.createDataFrame(
        [(3, 33.0, "x"), (100, 1.0, "y")], "id long, v double, tag string"
    )
    v_before = DeltaLog(tbl).latest_version()
    merge_upsert(spark, tbl, src, ["id"], schema_evolution=True)
    assert DeltaLog(tbl).latest_version() == v_before + 1  # ONE commit
    # the merge commit itself carries the widened metaData
    acts = DeltaLog(tbl).commit_actions(v_before + 1)
    md = [a for a in acts if "metaData" in a]
    assert md and '"tag"' in md[0]["metaData"]["schemaString"]
    rows = {r["id"]: (r["v"], r["tag"]) for r in DeltaTable(spark, tbl).to_df().collect()}
    assert rows[3] == (33.0, "x")
    assert rows[100] == (1.0, "y")
    assert rows[0] == (0.0, None)  # old rows read NULL


def test_without_evolution_source_extra_cols_coerced(spark, tbl):
    # pre-round-5 contract unchanged: no evolution -> extras dropped
    src = spark.createDataFrame([(3, 9.0, "x")], "id long, v double, tag string")
    merge_upsert(spark, tbl, src, ["id"])
    assert [f.name for f in DeltaTable(spark, tbl).schema().fields] == ["id", "v"]


def test_evolution_source_missing_column_update_keeps_target(spark, tbl):
    src = spark.createDataFrame(
        [(3, 33.0, "x"), (100, 1.0, "y")], "id long, v double, tag string"
    )
    merge_upsert(spark, tbl, src, ["id"], schema_evolution=True)
    # second merge: source lacks v entirely
    src2 = spark.createDataFrame([(3, "z"), (200, "w")], "id long, tag string")
    merge_upsert(spark, tbl, src2, ["id"], schema_evolution=True)
    rows = {r["id"]: (r["v"], r["tag"]) for r in DeltaTable(spark, tbl).to_df().collect()}
    assert rows[3] == (33.0, "z")  # v kept (UPDATE SET * rule), tag updated
    assert rows[200] == (None, "w")  # insert NULL-fills missing column


def test_evolution_requires_key_in_source(spark, tbl):
    src = spark.createDataFrame([("x",)], "tag string")
    with pytest.raises(ValueError, match="merge key"):
        merge_upsert(spark, tbl, src, ["id"], schema_evolution=True)


def test_mor_evolution_with_cdf(spark, tmp_path):
    path = str(tmp_path / "se_mor")
    write_delta(
        spark.createDataFrame(
            [(i, i % 2, float(i)) for i in range(10)], "id long, k long, v double"
        ),
        path,
        partition_by=["k"],
        configuration={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
        },
    )
    src = spark.createDataFrame(
        [(4, 0, 44.0, 9), (300, 0, 3.0, 7)], "id long, k long, v double, extra long"
    )
    merge_upsert_mor(spark, path, src, ["id"], schema_evolution=True)
    t = DeltaTable(spark, path)
    assert [f.name for f in t.schema().fields] == ["id", "k", "v", "extra"]
    rows = {r["id"]: r["extra"] for r in t.to_df().collect()}
    assert rows[4] == 9 and rows[300] == 7 and rows[1] is None
    # cdc files carry the evolved column
    from athena_delta_lake_spark.delta.cdf import table_changes

    ch = table_changes(spark, path, 1, 1).collect()
    assert sorted((r["_change_type"], r["id"], r["extra"]) for r in ch) == [
        ("insert", 300, 7),
        ("update_postimage", 4, 9),
        ("update_preimage", 4, None),
    ]


def test_evolution_column_mapped_assigns_ids(spark, tmp_path):
    from athena_delta_lake_spark.delta.writer import enable_column_mapping

    path = str(tmp_path / "se_cm")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(6)], "id long, v double"),
        path,
    )
    enable_column_mapping(path)
    src = spark.createDataFrame([(2, 9.0, 5), (50, 1.0, 6)], "id long, v double, n long")
    merge_upsert(spark, path, src, ["id"], schema_evolution=True)
    snap = DeltaLog(path).snapshot()
    fld = {f.name: f for f in snap.schema.fields}["n"]
    meta = fld.metadata or {}
    assert meta.get("delta.columnMapping.id") is not None
    assert str(meta.get("delta.columnMapping.physicalName", "")).startswith("col-")
    cfg = snap.metadata["configuration"]
    assert int(cfg["delta.columnMapping.maxColumnId"]) >= int(
        meta["delta.columnMapping.id"]
    )
    rows = {r["id"]: r["n"] for r in DeltaTable(spark, path).to_df().collect()}
    assert rows[2] == 5 and rows[50] == 6 and rows[0] is None


def test_insert_only_merge_evolution(spark, tbl):
    # no matched clauses at all: the insert-only fast path must evolve too
    src = spark.createDataFrame([(700, 7.0, "new")], "id long, v double, tag string")
    merge_upsert(
        spark, tbl, src, ["id"], matched_clauses=[], when_not_matched="insert",
        schema_evolution=True,
    )
    rows = {r["id"]: r for r in DeltaTable(spark, tbl).to_df().collect()}
    assert rows[700]["tag"] == "new" and rows[0]["tag"] is None


def test_time_travel_keeps_old_schema(spark, tbl):
    src = spark.createDataFrame([(3, 1.0, "x")], "id long, v double, tag string")
    merge_upsert(spark, tbl, src, ["id"], schema_evolution=True)
    old = DeltaTable(spark, tbl).to_df(version=0)
    assert old.columns == ["id", "v"]


def test_sql_merge_with_schema_evolution(spark, tmp_path):
    pond = DeltaPond(spark, str(tmp_path / "pond"))
    pond.sql("CREATE SCHEMA lake")
    pond.sql("CREATE TABLE lake.t AS SELECT id, CAST(id AS DOUBLE) AS v FROM range(10)")
    spark.sql(
        "SELECT 3 AS id, 33.0 AS v, 'x' AS tag UNION ALL SELECT 100, 1.0, 'y'"
    ).createOrReplaceTempView("se_sql_src")
    pond.sql(
        "MERGE WITH SCHEMA EVOLUTION INTO lake.t AS t USING se_sql_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    rows = {r["id"]: r["tag"] for r in pond.sql("SELECT id, tag FROM lake.t").collect()}
    assert rows[3] == "x" and rows[100] == "y" and rows[0] is None


def test_insert_by_name_auto_merge(spark, tmp_path):
    pond = DeltaPond(spark, str(tmp_path / "pond2"))
    pond.sql("CREATE SCHEMA lake")
    pond.sql("CREATE TABLE lake.t2 AS SELECT id FROM range(5)")
    # without the conf: extra column silently dropped (old contract)
    pond.sql("INSERT INTO lake.t2 BY NAME SELECT 100 AS id, 'x' AS tag")
    assert pond.sql("SELECT * FROM lake.t2").columns == ["id"]
    old = spark.conf.get("spark.databricks.delta.schema.autoMerge.enabled", "false")
    try:
        spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", "true")
        pond.sql("INSERT INTO lake.t2 BY NAME SELECT 200 AS id, 'y' AS tag")
    finally:
        spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", old)
    rows = {r["id"]: r["tag"] for r in pond.sql("SELECT id, tag FROM lake.t2").collect()}
    assert rows[200] == "y" and rows[0] is None


# --------------------------- identity columns through MERGE (round 5)


@pytest.fixture
def ident_tbl(spark, tmp_path):
    path = str(tmp_path / "ident")
    write_delta(
        spark.createDataFrame([("a", 1.0), ("b", 2.0)], "name string, v double"),
        path,
        identity_columns={"rid": (100, 10)},
    )
    return path


def test_merge_assigns_identity_on_insert(spark, ident_tbl):
    src = spark.createDataFrame(
        [("b", 20.0), ("c", 3.0), ("d", 4.0)], "name string, v double"
    )
    merge_upsert(spark, ident_tbl, src, ["name"])
    rows = {r["name"]: r["rid"] for r in DeltaTable(spark, ident_tbl).to_df().collect()}
    assert rows["b"] == 110  # updated row KEEPS its identity
    assert len(set(rows.values())) == 4  # fresh unique ids for c, d
    # high-water mark advanced in the merge commit's metaData: a later
    # append through write_delta must not collide
    write_delta(
        spark.createDataFrame([("e", 9.0)], "name string, v double"),
        ident_tbl,
        mode="append",
    )
    rows2 = {r["name"]: r["rid"] for r in DeltaTable(spark, ident_tbl).to_df().collect()}
    assert len(set(rows2.values())) == 5


def test_merge_mor_assigns_identity(spark, ident_tbl):
    src = spark.createDataFrame([("b", 99.0), ("z", 1.0)], "name string, v double")
    merge_upsert_mor(spark, ident_tbl, src, ["name"])
    rows = {r["name"]: (r["rid"], r["v"]) for r in DeltaTable(spark, ident_tbl).to_df().collect()}
    assert rows["b"][0] == 110 and rows["b"][1] == 99.0
    assert len({rid for rid, _ in rows.values()}) == 3


def test_merge_refuses_supplied_identity(spark, ident_tbl):
    bad = spark.createDataFrame([("x", 7, 5.0)], "name string, rid long, v double")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        merge_upsert(spark, ident_tbl, bad, ["name"])


def test_merge_on_identity_key(spark, ident_tbl):
    # matched-only merge ON the identity column is legal (existing ids)
    src = spark.createDataFrame([(110, -1.0)], "rid long, v double")
    merge_upsert(
        spark, ident_tbl, src.withColumn("name", __import__("pyspark").sql.functions.lit("bb")),
        ["rid"], when_not_matched=None,
    )
    rows = {r["rid"]: r["name"] for r in DeltaTable(spark, ident_tbl).to_df().collect()}
    assert rows[110] == "bb"
    # but INSERT through an identity key is refused (ids are assigned)
    with pytest.raises(ValueError, match="merge key"):
        merge_upsert(spark, ident_tbl, src.withColumn(
            "name", __import__("pyspark").sql.functions.lit("x")), ["rid"])
