"""Catalog discovery over a storage layout (reference: doListSchemaNames /
doListTables, DeltaMetadataHandler.scala:74-88 — rebuilt without _$folder$
markers or 1000-key truncation)."""

import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaPond, write_delta


@pytest.fixture
def pond_root(spark, tmp_path):
    root = tmp_path / "lake"
    os.makedirs(root / "sales")
    os.makedirs(root / "ml")
    # Delta table
    write_delta(
        spark.range(50).select(F.col("id"), (F.col("id") % 2).alias("p")),
        str(root / "sales" / "orders"),
        partition_by=["p"],
    )
    # bare-parquet table (directory)
    spark.range(20).write.parquet(str(root / "sales" / "refs"))
    # flat single-file parquet table
    spark.range(10).toPandas().to_parquet(str(root / "ml" / "vectors.parquet"))
    # noise that must NOT be listed
    os.makedirs(root / "_staging")
    os.makedirs(root / "sales" / ".tmp")
    return str(root)


def test_list_schemas_tables(spark, pond_root):
    pond = DeltaPond(spark, pond_root)
    assert pond.list_schemas() == ["ml", "sales"]
    assert pond.list_tables("sales") == ["orders", "refs"]
    assert pond.list_tables("ml") == ["vectors"]


def test_read_delta_and_parquet(spark, pond_root):
    pond = DeltaPond(spark, pond_root)
    assert pond.read("sales", "orders").count() == 50
    assert pond.read("sales", "refs").count() == 20
    assert pond.read("ml", "vectors").count() == 10
    assert pond.table("sales", "orders").partition_columns() == ["p"]
    with pytest.raises(ValueError, match="not a Delta table"):
        pond.table("sales", "refs")
    with pytest.raises(FileNotFoundError):
        pond.read("sales", "nope")


def test_register_all_sql(spark, pond_root):
    pond = DeltaPond(spark, pond_root)
    views = pond.register_all("sales")
    assert views == ["orders", "refs"]
    n = spark.sql("SELECT count(*) AS n FROM orders WHERE p = 1").collect()[0]["n"]
    assert n == 25


def test_create_and_drop_table(spark, tmp_path):
    from athena_delta_lake_spark import DeltaPond

    root = str(tmp_path / "pond")
    os.makedirs(os.path.join(root, "ml"))
    pond = DeltaPond(spark, root)
    df = spark.range(25).selectExpr("id", "id % 5 AS p")
    t = pond.create_table("ml", "feats", df, partition_by=["p"])
    assert pond.list_tables("ml") == ["feats"]
    assert t.to_df().count() == 25
    pond.create_table("ml", "feats", spark.range(25, 30).selectExpr("id", "id % 5 AS p"))
    assert pond.read("ml", "feats").count() == 30
    pond.drop_table("ml", "feats")
    assert pond.list_tables("ml") == []


# ---------------------------------------------------- lazy SQL resolution


def test_pond_sql_resolves_lazily(spark, tmp_path):
    """pond.sql works with NO registration step: names resolve from the
    storage layout at analysis time (the doGetTable analogue)."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond")
    for db, tbl, n in [("sales", "orders", 10), ("sales", "items", 5), ("hr", "people", 3)]:
        p = f"{root}/{db}/{tbl}"
        write_delta(spark.range(n).selectExpr("id", f"'{tbl}' AS src"), p)

    pond = DeltaPond(spark, root)
    # dotted name, never registered
    got = pond.sql("SELECT count(*) AS n FROM sales.orders").collect()
    assert got[0]["n"] == 10
    # join of two dotted names in one query
    got = pond.sql(
        "SELECT count(*) AS n FROM sales.orders o CROSS JOIN hr.people p"
    ).collect()
    assert got[0]["n"] == 30
    # bare name, unique across schemas
    assert pond.sql("SELECT count(*) AS n FROM people").collect()[0]["n"] == 3
    # a freshly-written table is immediately queryable by name
    write_delta(spark.range(7).selectExpr("id", "'new' AS src"), f"{root}/hr/badges")
    assert pond.sql("SELECT count(*) AS n FROM hr.badges").collect()[0]["n"] == 7


def test_pond_sql_ambiguous_bare_name(spark, tmp_path):
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond2")
    write_delta(spark.range(1).selectExpr("id"), f"{root}/a/t")
    write_delta(spark.range(2).selectExpr("id"), f"{root}/b/t")
    pond = DeltaPond(spark, root)
    with pytest.raises(ValueError, match="several schemas"):
        pond.sql("SELECT * FROM t")
    # qualified names still fine
    assert pond.sql("SELECT count(*) AS n FROM b.t").collect()[0]["n"] == 2


def test_pond_sql_missing_table_raises(spark, tmp_path):
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond3")
    write_delta(spark.range(1).selectExpr("id"), f"{root}/a/t")
    pond = DeltaPond(spark, root)
    with pytest.raises(Exception, match="nope|TABLE_OR_VIEW_NOT_FOUND"):
        pond.sql("SELECT * FROM a.nope")


def test_pond_sql_sees_ddl_changes(spark, tmp_path):
    """The metastore-less SQL path reflects metadata-only DDL immediately:
    RENAME COLUMN / DROP COLUMN / a shallow clone all resolve by name with
    no registration or refresh step."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.writer import (
        clone_table,
        drop_column,
        enable_column_mapping,
        rename_column,
    )

    root = str(tmp_path / "pond_ddl")
    p = f"{root}/lake/metrics"
    write_delta(
        spark.createDataFrame(
            [(1, "a", 2.5), (2, "b", 4.0)], "id long, tag string, score double"
        ),
        p,
    )
    pond = DeltaPond(spark, root)
    assert pond.sql("SELECT sum(score) AS s FROM lake.metrics").collect()[0]["s"] == 6.5
    enable_column_mapping(p)
    rename_column(p, "score", "quality")
    got = pond.sql(
        "SELECT sum(quality) AS s FROM lake.metrics"
    ).collect()
    assert got[0]["s"] == 6.5
    drop_column(p, "tag")
    cols = pond.sql("SELECT * FROM lake.metrics").columns
    assert cols == ["id", "quality"]
    clone_table(p, f"{root}/lake/metrics_dev")
    assert (
        pond.sql("SELECT count(*) AS n FROM lake.metrics_dev").collect()[0]["n"] == 2
    )


def test_pond_sql_literal_lookalike_untouched(spark, tmp_path):
    """A string literal (or comment) containing `schema.table` text must
    not be rewritten: relation references come from the parsed plan's
    UnresolvedRelation origins, not from text matching."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond

    root = str(tmp_path / "pond_lit")
    write_delta(
        spark.createDataFrame(
            [(1, "lake.delta_lineitem"), (2, "other")], "id long, src string"
        ),
        f"{root}/lake/delta_lineitem",
    )
    pond = DeltaPond(spark, root)
    got = pond.sql(
        "SELECT count(*) AS n FROM lake.delta_lineitem  -- lake.delta_lineitem\n"
        "WHERE src = 'lake.delta_lineitem'"
    ).collect()
    assert got[0]["n"] == 1
    # literal-only query: nothing rewritten, nothing bound
    got = pond.sql("SELECT 'lake.delta_lineitem' AS s").collect()
    assert got[0]["s"] == "lake.delta_lineitem"
    # subquery + CTE referencing pond tables still resolve
    got = pond.sql(
        "WITH t AS (SELECT id FROM lake.delta_lineitem) "
        "SELECT count(*) AS n FROM t "
        "WHERE EXISTS (SELECT 1 FROM lake.delta_lineitem x WHERE x.id = t.id)"
    ).collect()
    assert got[0]["n"] == 2


def test_pond_sql_time_travel(spark, tmp_path):
    """VERSION AS OF / TIMESTAMP AS OF resolve against the Delta log:
    each travel clause binds its own snapshot view, spliced at the parse
    span of the whole `name AS OF ...` clause."""
    import time

    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.log import DeltaLog

    root = str(tmp_path / "pond_tt")
    p = f"{root}/lake/m"
    write_delta(spark.range(3).selectExpr("id"), p)  # v0: 3 rows
    write_delta(spark.range(10, 14).selectExpr("id"), p)  # v1: +4 rows
    pond = DeltaPond(spark, root)
    assert pond.sql("SELECT count(*) AS n FROM lake.m").first()["n"] == 7
    assert (
        pond.sql("SELECT count(*) AS n FROM lake.m VERSION AS OF 0").first()["n"]
        == 3
    )
    # both versions of the SAME table in ONE query
    got = pond.sql(
        "SELECT (SELECT count(*) FROM lake.m) AS now, "
        "(SELECT count(*) FROM lake.m VERSION AS OF 0) AS then"
    ).first()
    assert (got["now"], got["then"]) == (7, 3)
    # timestamp travel: use v0's commit time
    t0 = DeltaLog(p).commit_timestamp(0)
    import datetime

    ts = datetime.datetime.fromtimestamp(
        t0 / 1000, tz=datetime.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    n = pond.sql(
        f"SELECT count(*) AS n FROM lake.m TIMESTAMP AS OF '{ts}'"
    ).first()["n"]
    assert n == 3


def test_pond_sql_table_changes_tvf(spark, tmp_path):
    """table_changes('schema.table', start [, end]) in pond.sql returns
    the change feed for that commit range (the Delta CDF TVF shape)."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import dml

    root = str(tmp_path / "pond_cdf")
    p = f"{root}/lake/c"
    write_delta(spark.range(5).selectExpr("id"), p)  # v0
    write_delta(spark.range(10, 12).selectExpr("id"), p)  # v1: +2
    dml.delete(spark, p, where="id = 10")  # v2: -1 (+1 re-add of id=11)
    pond = DeltaPond(spark, root)
    got = {
        (r["_change_type"], r["_commit_version"]): r["n"]
        for r in pond.sql(
            "SELECT _change_type, _commit_version, count(*) AS n "
            "FROM table_changes('lake.c', 1, 2) GROUP BY 1, 2"
        ).collect()
    }
    assert got[("insert", 1)] == 2
    assert got.get(("delete", 2)) == 1
    # open-ended range + bare name + join with the live table
    n = pond.sql(
        "SELECT count(*) AS n FROM table_changes('lake.c', 0) ch "
        "JOIN lake.c t ON ch.id = t.id WHERE ch._change_type = 'insert'"
    ).first()["n"]
    assert n >= 5
