"""Optional Serializable isolation for DML (round-6 ask #5): the default
OCC is file-granular (write_serializable — rewrites commute when their
removed files are untouched), which admits write-skew: a concurrent
append can slip rows past a running MERGE's NOT-MATCHED scan.
`isolation='serializable'` additionally refuses commits when any
interleaved commit ADDED dataChange files matching the DML's read
predicate (delta-spark parity; writer.py _serializable_read_conflict)."""

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.writer import ConcurrentWriteError


def _mk(spark, path, partitioned=True):
    write_delta(
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(100)], "id long, k long, v double"
        ),
        path,
        partition_by=["k"] if partitioned else [],
    )


def _race_on_stage(monkeypatch, racer):
    """Fire `racer` once, mid-plan (while the loser is staging its
    rewrite), mirroring test_concurrent_writers' TOCTOU harness."""
    import athena_delta_lake_spark.delta.dml as D

    real = D.stage_data_files
    fired = {"done": False}

    def staged(*a, **k):
        if not fired["done"]:
            fired["done"] = True
            racer()
        return real(*a, **k)

    monkeypatch.setattr(D, "stage_data_files", staged)


def test_merge_not_matched_scan_vs_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """The canonical skew: MERGE plans its NOT-MATCHED anti-join, a
    concurrent append inserts key 999 before the merge commits, and the
    merge would also insert 999 (duplicate key). Serializable refuses;
    the table never sees the duplicate."""
    from athena_delta_lake_spark.delta.dml import merge_upsert

    path = str(tmp_path / "m")
    _mk(spark, path, partitioned=False)
    src = spark.createDataFrame(
        [(999, 0, -1.0), (5, 1, -5.0)], "id long, k long, v double"
    )

    def racer():
        write_delta(
            spark.createDataFrame([(999, 0, 7.0)], "id long, k long, v double"),
            path,
        )

    _race_on_stage(monkeypatch, racer)
    with pytest.raises(ConcurrentWriteError, match="read predicate"):
        merge_upsert(spark, path, src, keys=["id"], isolation="serializable")
    monkeypatch.undo()
    # the loser changed nothing: exactly one 999 row (the racer's)
    df = DeltaTable(spark, path).to_df()
    assert df.filter("id = 999").count() == 1
    assert df.filter("id = 5 and v = -5.0").count() == 0


def test_default_isolation_admits_the_same_interleaving(
    spark, tmp_path, monkeypatch
):
    """Same race under the DEFAULT write_serializable isolation: disjoint
    file sets commute, the merge lands — documenting exactly the skew
    serializable exists to refuse (here: duplicate id 999)."""
    from athena_delta_lake_spark.delta.dml import merge_upsert

    path = str(tmp_path / "m2")
    _mk(spark, path, partitioned=False)
    src = spark.createDataFrame([(999, 0, -1.0)], "id long, k long, v double")

    def racer():
        write_delta(
            spark.createDataFrame([(999, 0, 7.0)], "id long, k long, v double"),
            path,
        )

    _race_on_stage(monkeypatch, racer)
    merge_upsert(spark, path, src, keys=["id"])  # commutes, no error
    monkeypatch.undo()
    df = DeltaTable(spark, path).to_df()
    assert df.filter("id = 999").count() == 2  # the admitted write-skew


def test_serializable_delete_ignores_nonoverlapping_append(
    spark, tmp_path, monkeypatch
):
    """Serializable is predicate-scoped, not table-locking: an append
    whose files provably cannot match the DELETE's read predicate
    (different partition) still commutes."""
    from athena_delta_lake_spark.delta.dml import delete

    path = str(tmp_path / "d")
    _mk(spark, path, partitioned=True)

    def racer():
        write_delta(
            spark.createDataFrame([(500, 3, 1.0)], "id long, k long, v double"),
            path,
            partition_by=["k"],
        )

    _race_on_stage(monkeypatch, racer)
    delete(spark, path, "k = 2 and id >= 0", isolation="serializable")
    monkeypatch.undo()
    df = DeltaTable(spark, path).to_df()
    assert df.filter("k = 2").count() == 0
    assert df.filter("id = 500").count() == 1  # racer's row survives


def test_serializable_delete_refuses_overlapping_append(
    spark, tmp_path, monkeypatch
):
    """An append INTO the DELETE's predicate range between plan and
    commit is refused: rows matching the predicate must not survive a
    serializable DELETE by slipping in behind its scan."""
    from athena_delta_lake_spark.delta.dml import delete

    path = str(tmp_path / "d2")
    _mk(spark, path, partitioned=True)

    def racer():
        write_delta(
            spark.createDataFrame([(600, 2, 1.0)], "id long, k long, v double"),
            path,
            partition_by=["k"],
        )

    _race_on_stage(monkeypatch, racer)
    with pytest.raises(ConcurrentWriteError, match="read predicate"):
        delete(spark, path, "k = 2 and id >= 0", isolation="serializable")
    monkeypatch.undo()
    # rerun against the new snapshot: now it sees the racer's row too
    delete(spark, path, "k = 2 and id >= 0", isolation="serializable")
    assert DeltaTable(spark, path).to_df().filter("k = 2").count() == 0


def test_serializable_merge_refuses_concurrent_remove_only_commit(
    spark, tmp_path, monkeypatch
):
    """Write-skew via DELETION: a partition fast-path DELETE commits
    remove-only actions (no adds) while a serializable MERGE's read is
    in flight — the merge read rows that are now gone, so Serializable
    must refuse (ConcurrentDeleteRead analogue), even though the merge's
    own rewritten files are untouched."""
    from athena_delta_lake_spark.delta.dml import delete, merge_upsert

    path = str(tmp_path / "m3")
    _mk(spark, path, partitioned=True)
    src = spark.createDataFrame([(5, 1, -5.0)], "id long, k long, v double")

    def racer():
        delete(spark, path, "k = 3")  # metadata-only partition delete

    _race_on_stage(monkeypatch, racer)
    with pytest.raises(ConcurrentWriteError, match="read predicate"):
        merge_upsert(spark, path, src, keys=["id"], isolation="serializable")
    monkeypatch.undo()
    df = DeltaTable(spark, path).to_df()
    assert df.filter("k = 3").count() == 0  # winner's delete held
    assert df.filter("v = -5.0").count() == 0  # loser changed nothing


def test_unknown_isolation_literal_raises(spark, tmp_path):
    """A typo in the isolation level must fail loudly, never silently
    downgrade a correctness switch to the default."""
    from athena_delta_lake_spark.delta.dml import delete

    path = str(tmp_path / "iso")
    _mk(spark, path, partitioned=False)
    with pytest.raises(ValueError, match="unknown isolation"):
        delete(spark, path, "id < 5", isolation="Serializable")
