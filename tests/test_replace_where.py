"""replaceWhere (selective overwrite): replace only predicate-matching
rows in one commit — the standard "repair one partition" batch-write
pattern. Partition-scoped predicates must be metadata+append (no data
I/O on untouched partitions); arbitrary predicates rewrite only the
boundary files."""

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.delta import DeltaLog, DeltaTable, write_delta
from athena_delta_lake_spark.delta.writer import ConcurrentWriteError


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "rw_tbl")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, ds int, v double"
    )
    write_delta(df, path, partition_by=["ds"])
    return path


def _rows(spark, path):
    return {
        (r["id"], r["ds"], r["v"])
        for r in DeltaTable(spark, path).to_df().collect()
    }


def test_partition_scoped_replace_is_metadata_plus_append(spark, tbl):
    before = DeltaLog(tbl).snapshot()
    untouched = {
        f.path for f in before.files if f.partition_values.get("ds") != "1"
    }
    repl = spark.createDataFrame(
        [(100, 1, 0.5), (101, 1, 0.7)], "id long, ds int, v double"
    )
    write_delta(repl, tbl, mode="overwrite", replace_where="ds = 1")

    after = DeltaLog(tbl).snapshot()
    # every non-matching file survives UNREWRITTEN (same path): the
    # replace touched only partition ds=1
    assert untouched <= {f.path for f in after.files}
    got = _rows(spark, tbl)
    assert {(i, i % 3, float(i)) for i in range(30) if i % 3 != 1} <= got
    assert (100, 1, 0.5) in got and (101, 1, 0.7) in got
    assert all(ds != 1 or i in (100, 101) for i, ds, _v in got)
    # partition spec inherited, not dropped
    assert after.partition_columns == ["ds"]


def test_arbitrary_predicate_rewrites_boundary_files(spark, tbl):
    repl = spark.createDataFrame(
        [(22, 0, 99.0)], "id long, ds int, v double"
    )
    write_delta(
        repl, tbl, mode="overwrite", replace_where="id >= 20 AND id < 25"
    )
    got = _rows(spark, tbl)
    expect = {(i, i % 3, float(i)) for i in range(30) if not (20 <= i < 25)}
    expect.add((22, 0, 99.0))
    assert got == expect


def test_incoming_rows_must_satisfy_predicate(spark, tbl):
    bad = spark.createDataFrame([(100, 2, 0.5)], "id long, ds int, v double")
    with pytest.raises(ValueError, match="do not satisfy"):
        write_delta(bad, tbl, mode="overwrite", replace_where="ds = 1")
    # nothing changed
    assert DeltaTable(spark, tbl).to_df().count() == 30


def test_replace_where_guards(spark, tbl):
    df = spark.createDataFrame([(100, 1, 0.5)], "id long, ds int, v double")
    with pytest.raises(ValueError, match="mode='overwrite'"):
        write_delta(df, tbl, mode="append", replace_where="ds = 1")
    with pytest.raises(ValueError, match="match the table schema"):
        write_delta(
            spark.createDataFrame([(1, 1)], "id long, ds int"),
            tbl,
            mode="overwrite",
            replace_where="ds = 1",
        )


def test_replace_where_time_travel_and_history(spark, tbl):
    v0 = DeltaLog(tbl).snapshot().version
    repl = spark.createDataFrame([(100, 1, 0.5)], "id long, ds int, v double")
    write_delta(repl, tbl, mode="overwrite", replace_where="ds = 1")
    # the pre-replace snapshot still reads consistently
    assert DeltaTable(spark, tbl).to_df(version=v0).count() == 30
    assert DeltaTable(spark, tbl).to_df().count() == 21


def test_replace_where_empty_replacement_clears_partition(spark, tbl):
    # replacing with ZERO rows == partition-scoped delete
    empty = spark.createDataFrame([], "id long, ds int, v double")
    write_delta(empty, tbl, mode="overwrite", replace_where="ds = 2")
    got = _rows(spark, tbl)
    assert got == {(i, i % 3, float(i)) for i in range(30) if i % 3 != 2}


def test_replace_where_loses_race_cleanly(spark, tbl, monkeypatch):
    """A replaceWhere planned against a stale snapshot must refuse to
    commit (it would resurrect or double-remove raced files)."""
    import athena_delta_lake_spark.delta.writer as W

    real_stage = W.stage_data_files
    raced = {"done": False}

    def racing_stage(*a, **k):
        if not raced["done"]:
            raced["done"] = True
            write_delta(
                spark.createDataFrame(
                    [(500, 1, 1.0)], "id long, ds int, v double"
                ),
                tbl,
                mode="append",
            )
        return real_stage(*a, **k)

    monkeypatch.setattr(W, "stage_data_files", racing_stage)
    with pytest.raises(ConcurrentWriteError):
        write_delta(
            spark.createDataFrame([(100, 1, 0.5)], "id long, ds int, v double"),
            tbl,
            mode="overwrite",
            replace_where="ds = 1",
        )
    monkeypatch.undo()
    # winner's append survives; loser changed nothing
    ids = {r["id"] for r in DeltaTable(spark, tbl).to_df().collect()}
    assert ids == set(range(30)) | {500}


def test_replace_where_validates_on_first_write(spark, tmp_path):
    """The incoming-row predicate check applies to a table's FIRST write
    too, so a pipeline behaves identically on first and later runs."""
    path = str(tmp_path / "fresh")
    df = spark.createDataFrame([(1, 2)], "id long, ds long")
    with pytest.raises(ValueError, match="do not satisfy"):
        write_delta(df, path, mode="overwrite", replace_where="ds = 1")
    ok = spark.createDataFrame([(1, 1)], "id long, ds long")
    write_delta(ok, path, mode="overwrite", replace_where="ds = 1")
    assert DeltaTable(spark, path).to_df().count() == 1
