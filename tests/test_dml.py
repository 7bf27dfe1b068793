"""Delta DML: copy-on-write DELETE/UPDATE/MERGE + OPTIMIZE + VACUUM.

Beyond result correctness these pin the SCALE contracts: untouched files
are never rewritten (copy-on-write touches only candidates), partition-only
deletes are metadata commits with zero data I/O, and compaction commits
dataChange=false."""

import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta


@pytest.fixture
def tbl(spark, tmp_path):
    path = str(tmp_path / "dml_tbl")
    df = spark.createDataFrame(
        [(i, i % 4, float(i), f"name_{i}") for i in range(400)],
        "id int, part int, v double, name string",
    )
    write_delta(df, path, partition_by=["part"])
    return path


def _file_paths(t: DeltaTable) -> set:
    return {f.path for f in t.snapshot().files}


def test_delete_partition_fast_path(spark, tbl):
    t = DeltaTable(spark, tbl)
    v0_files = _file_paths(t)
    res = t.delete(where=[("part", "=", 3)])
    assert res["files_added"] == 0  # metadata-only: nothing rewritten
    assert res["rows_deleted"] == 100
    assert t.to_df().count() == 300
    assert t.to_df().filter("part = 3").count() == 0
    # untouched partitions keep their exact physical files
    assert _file_paths(t) < v0_files
    # time travel still sees the deleted rows
    assert t.to_df(version=0).count() == 400


def test_delete_data_predicate_rewrites_only_candidates(spark, tbl):
    t = DeltaTable(spark, tbl)
    before = _file_paths(t)
    res = t.delete(where="part = 1 AND id < 100")
    # candidates were pruned to partition 1 only; other partitions' files
    # must survive BY IDENTITY (no rewrite)
    after = _file_paths(t)
    untouched_before = {p for p in before if "part=1" not in p}
    assert untouched_before <= after
    assert t.to_df().count() == 400 - res["rows_deleted"]
    assert t.to_df().filter("part = 1 and id < 100").count() == 0
    assert t.to_df().filter("part = 1").count() == 100 - res["rows_deleted"]


def test_delete_null_condition_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id int, v double"
    )
    write_delta(df, path, partition_by=[])
    t = DeltaTable(spark, path)
    t.delete(where="v > 20")
    # SQL DELETE removes only rows where the predicate is TRUE; the NULL row stays
    assert sorted(r.id for r in t.to_df().collect()) == [1, 2]


def test_update_where(spark, tbl):
    t = DeltaTable(spark, tbl)
    t.update({"v": "v * 10", "name": "'updated'"}, where="part = 2 AND id < 10")
    out = t.to_df().filter("part = 2").orderBy("id").collect()
    for r in out:
        if r.id < 10:
            assert r.v == r.id * 10.0 and r.name == "updated"
        else:
            assert r.v == float(r.id) and r.name == f"name_{r.id}"
    # other partitions untouched
    assert t.to_df().filter("part != 2 and name = 'updated'").count() == 0


def test_update_partition_column_moves_rows(spark, tbl):
    t = DeltaTable(spark, tbl)
    t.update({"part": "9"}, where=[("part", "=", 0)])
    assert t.to_df().filter("part = 0").count() == 0
    assert t.to_df().filter("part = 9").count() == 100
    # moved rows physically live under the new hive dir
    assert any("part=9" in p for p in _file_paths(t))


def test_merge_upsert(spark, tbl):
    t = DeltaTable(spark, tbl)
    before = _file_paths(t)
    src = spark.createDataFrame(
        [(5, 1, 555.0, "merged_5"), (1000, 2, 1000.0, "inserted")],
        "id int, part int, v double, name string",
    )
    res = t.merge(src, keys=["id"])
    df = t.to_df()
    assert df.count() == 401  # 400 - 1 matched + 2 source
    r5 = df.filter("id = 5").collect()[0]
    assert r5.v == 555.0 and r5.name == "merged_5"
    assert df.filter("id = 1000").count() == 1
    # id=5 lived in part=1: only files containing it get rewritten
    assert res["files_removed"] >= 1
    untouched = {p for p in before if "part=1" not in p}
    assert untouched <= _file_paths(t)


def test_merge_into_empty_and_no_match(spark, tmp_path):
    path = str(tmp_path / "m2")
    base = spark.createDataFrame([(1, "a")], "id int, s string")
    write_delta(base, path, partition_by=[])
    t = DeltaTable(spark, path)
    src = spark.createDataFrame([(2, "b")], "id int, s string")
    res = t.merge(src, keys=["id"])
    assert res["files_removed"] == 0  # no key overlap: pure append
    assert t.to_df().count() == 2


def test_compact_binpacks_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "frag")
    for i in range(5):  # 5 commits -> >= 5 small files per partition
        df = spark.createDataFrame(
            [(i * 100 + j, j % 2, float(j)) for j in range(100)],
            "id int, part int, v double",
        )
        write_delta(df, path, partition_by=["part"], mode="append")
    t = DeltaTable(spark, path)
    n_before = len(t.snapshot().files)
    total_before = t.to_df().groupBy().agg(F.sum("id"), F.count("*")).collect()[0]
    res = t.compact()
    assert res["files_removed"] == n_before
    assert len(t.snapshot().files) < n_before
    total_after = t.to_df().groupBy().agg(F.sum("id"), F.count("*")).collect()[0]
    assert tuple(total_before) == tuple(total_after)
    # OPTIMIZE is not a data change
    hist = t.history()
    assert hist[0]["operation"] == "OPTIMIZE"


def test_vacuum_removes_only_unreferenced_and_expired(spark, tbl):
    t = DeltaTable(spark, tbl)
    t.delete(where=[("part", "=", 0)])  # part=0 files now unreferenced
    dry = t.vacuum(retention_hours=0.0, dry_run=True)
    assert dry["files"] and all("part=0" in f for f in dry["files"])
    assert not dry["deleted"]
    # retention protects recent files
    assert t.vacuum(retention_hours=1.0, dry_run=True)["files"] == []
    res = t.vacuum(retention_hours=0.0)
    assert res["deleted"] and res["files"] == dry["files"]
    for rel in res["files"]:
        assert not os.path.exists(os.path.join(tbl, rel))
    # live data intact; time travel to v0 now (correctly) fails on data read
    assert t.to_df().count() == 300


def test_dml_versions_chain(spark, tbl):
    t = DeltaTable(spark, tbl)
    t.delete(where=[("part", "=", 3)])
    t.update({"v": "0.0"}, where="id = 0")
    t.compact()
    ops = [h["operation"] for h in t.history()]
    assert ops[:3] == ["OPTIMIZE", "UPDATE", "DELETE"]
    # every intermediate version remains queryable (time travel across DML)
    assert t.to_df(version=0).count() == 400
    assert t.to_df(version=1).count() == 300


def test_restore_round_trip(spark, tbl):
    t = DeltaTable(spark, tbl)
    t.delete(where=[("part", "=", 1)])  # v1
    t.write(
        spark.createDataFrame(
            [(1000, 9, 1.0, "late")], "id int, part int, v double, name string"
        ),
        mode="append",
    )  # v2
    assert t.to_df().count() == 301
    res = t.restore(version=0)  # v3
    assert res["restored_to"] == 0 and res["committed_version"] == 3
    assert t.to_df().count() == 400
    assert t.to_df().filter("part = 1").count() == 100
    assert t.to_df().filter("id = 1000").count() == 0
    # content matches v0 exactly
    assert (
        t.to_df().exceptAll(t.to_df(version=0)).count() == 0
        and t.to_df(version=0).exceptAll(t.to_df()).count() == 0
    )
    # history preserved: restore is itself a version that can be undone
    assert t.history()[0]["operation"] == "RESTORE"
    t.restore(version=2)
    assert t.to_df().count() == 301


def test_restore_fails_after_vacuum(spark, tbl):
    t = DeltaTable(spark, tbl)
    t.delete(where=[("part", "=", 0)])
    t.vacuum(retention_hours=0.0)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.restore(version=0)


def test_restore_reinstates_schema(spark, tmp_path):
    path = str(tmp_path / "restore_schema")
    write_delta(spark.range(10).selectExpr("id"), path)
    write_delta(
        spark.range(10, 20).selectExpr("id", "id * 2 AS extra"),
        path,
        merge_schema=True,
    )
    t = DeltaTable(spark, path)
    assert "extra" in t.to_df().columns
    res = t.restore(version=0)
    assert res["metadata_restored"]
    assert t.to_df().columns == ["id"] and t.to_df().count() == 10


def test_optimize_zorder(spark, tmp_path):
    """OPTIMIZE with zorder_by rewrites the scoped files so min/max stats
    prune on every listed column (dataChange=false preserved)."""
    path = str(tmp_path / "opt_z")
    df = spark.range(40_000).selectExpr(
        "CAST(id % 200 AS BIGINT) AS a",
        "CAST(CAST(id / 200 AS BIGINT) % 200 AS BIGINT) AS b",
        "id AS payload",
    ).repartition(32)
    write_delta(df, path)  # unclustered
    t = DeltaTable(spark, path)
    res = t.compact(target_file_size=16 * 1024, zorder_by=["a", "b"])
    assert res["files_removed"] == 32 and res["files_added"] >= 16
    total = len(t.snapshot().files)
    assert len(t.pruned_files([("a", "=", 3)])) < total / 2
    assert len(t.pruned_files([("b", "=", 3)])) < total / 2
    assert t.to_df().count() == 40_000
    assert t.history()[0]["operation"] == "OPTIMIZE"


def test_merge_clause_semantics(spark, tmp_path):
    """WHEN MATCHED DELETE, WHEN NOT MATCHED insert-or-ignore, and
    NOT MATCHED BY SOURCE DELETE (full-sync)."""

    def fresh(name):
        path = str(tmp_path / name)
        df = spark.createDataFrame(
            [(i, i % 4, float(i), f"name_{i}") for i in range(100)],
            "id int, part int, v double, name string",
        )
        write_delta(df, path, partition_by=["part"])
        return DeltaTable(spark, path)

    src = spark.createDataFrame(
        [(5, 1, -5.0, "upd_5"), (500, 0, -500.0, "new_500")],
        "id int, part int, v double, name string",
    )

    # matched-delete + insert
    t = fresh("m1")
    t.merge(src, keys=["id"], when_matched="delete")
    got = {r["id"]: r["name"] for r in t.to_df().collect()}
    assert 5 not in got and got[500] == "new_500" and len(got) == 100

    # update only, no insert
    t = fresh("m2")
    t.merge(src, keys=["id"], when_not_matched=None)
    got = {r["id"]: r["name"] for r in t.to_df().collect()}
    assert got[5] == "upd_5" and 500 not in got and len(got) == 100

    # full sync: unmatched target rows are dropped, incl. whole untouched
    # partitions via metadata-only removes
    t = fresh("m3")
    res = t.merge(src, keys=["id"], not_matched_by_source="delete")
    got = {r["id"]: r["name"] for r in t.to_df().collect()}
    assert got == {5: "upd_5", 500: "new_500"}
    assert res["files_removed"] >= 4  # every prior file gone


def test_merge_matched_condition(spark, tmp_path):
    """WHEN MATCHED AND <cond>: condition-failing matched rows keep the
    TARGET version; null conditions count as false (SQL semantics)."""
    from athena_delta_lake_spark import DeltaTable, write_delta

    path = str(tmp_path / "cond")
    target = spark.createDataFrame(
        [(1, 10, "t1"), (2, 20, "t2"), (3, None, "t3")],
        "id int, ver int, name string",
    )
    write_delta(target, path)
    src = spark.createDataFrame(
        [(1, 99, "s1"), (2, 5, "s2"), (3, 1, "s3"), (4, 1, "s4")],
        "id int, ver int, name string",
    )
    t = DeltaTable(spark, path)
    t.merge(src, keys=["id"], matched_condition="s.ver > t.ver")
    got = {r["id"]: (r["ver"], r["name"]) for r in t.to_df().collect()}
    assert got == {
        1: (99, "s1"),   # cond true -> source version
        2: (20, "t2"),   # cond false -> target kept
        3: (None, "t3"), # cond null -> target kept
        4: (1, "s4"),    # not matched -> inserted
    }

    # conditional matched-delete: only condition-passing rows drop
    t.merge(
        spark.createDataFrame([(1, 0, "x"), (2, 100, "x")], "id int, ver int, name string"),
        keys=["id"],
        when_matched="delete",
        when_not_matched=None,
        matched_condition="s.ver > t.ver",
    )
    got = {r["id"] for r in t.to_df().collect()}
    assert got == {1, 3, 4}  # id=2 deleted (100 > 20); id=1 kept (0 < 99)


def test_upsert_order_independent_across_batches(spark, tmp_path):
    """Conditional-merge upsert converges to the same latest-per-key state
    for ANY batch arrival order (the streaming CDC invariant)."""
    from athena_delta_lake_spark import DeltaTable, write_delta

    rows = [(k, v, f"r{k}_{v}") for k in range(5) for v in range(4)]
    batches = [
        [r for r in rows if r[1] == v] for v in range(4)
    ]
    want = {k: (3, f"r{k}_3") for k in range(5)}

    for order in ([0, 1, 2, 3], [3, 2, 1, 0], [1, 3, 0, 2]):
        path = str(tmp_path / f"ord_{''.join(map(str, order))}")
        for i, bi in enumerate(order):
            b = spark.createDataFrame(batches[bi], "id int, ver int, name string")
            if i == 0:
                write_delta(b, path)
            else:
                DeltaTable(spark, path).merge(
                    b, keys=["id"], matched_condition="s.ver > t.ver"
                )
        got = {
            r["id"]: (r["ver"], r["name"])
            for r in DeltaTable(spark, path).to_df().collect()
        }
        assert got == want, order


def test_restore_undoes_later_deletion_vector(spark, tmp_path):
    """RESTORE to a version before a MOR delete must resurrect the
    DV-deleted rows even though the data file path never changed
    (regression: the restore diff compared paths only, so the newer DV
    survived and post-target deletions leaked through)."""
    from athena_delta_lake_spark import DeltaTable, write_delta

    path = str(tmp_path / "restore_dv")
    write_delta(spark.range(100).selectExpr("id"), path)
    t = DeltaTable(spark, path)
    t.delete(where="id < 10", mode="mor")   # v1: DV on the original file
    assert DeltaTable(spark, path).to_df().count() == 90
    t.delete(where="id < 20", mode="mor")   # v2: DV grows, same path
    assert DeltaTable(spark, path).to_df().count() == 80

    DeltaTable(spark, path).restore(version=1)
    assert DeltaTable(spark, path).to_df().count() == 90
    DeltaTable(spark, path).restore(version=0)
    assert DeltaTable(spark, path).to_df().count() == 100


def test_merge_duplicate_target_keys_per_row_semantics(spark, tmp_path):
    """Duplicate TARGET keys: each matched target row updates independently,
    and the row count is identical whether or not a matched condition is
    passed (the two branches previously disagreed)."""
    path = str(tmp_path / "dupkeys")
    target = spark.createDataFrame(
        [(1, 10, "a"), (1, 11, "b"), (2, 20, "c")], "id int, ver int, name string"
    )
    write_delta(target, path)
    src = spark.createDataFrame([(1, 99, "s")], "id int, ver int, name string")

    t = DeltaTable(spark, path)
    t.merge(src, keys=["id"], when_not_matched=None)
    rows = sorted((r["id"], r["ver"], r["name"]) for r in t.to_df().collect())
    # both id=1 target rows were replaced by the source row, independently
    assert rows == [(1, 99, "s"), (1, 99, "s"), (2, 20, "c")]

    # same shape with a condition: identical row count
    path2 = str(tmp_path / "dupkeys2")
    write_delta(target, path2)
    t2 = DeltaTable(spark, path2)
    t2.merge(src, keys=["id"], when_not_matched=None, matched_condition="s.ver > t.ver")
    rows2 = sorted((r["id"], r["ver"], r["name"]) for r in t2.to_df().collect())
    assert rows2 == [(1, 99, "s"), (1, 99, "s"), (2, 20, "c")]


def test_merge_duplicate_source_keys_raise(spark, tmp_path):
    """Multiple source rows matching one target key would make the update
    nondeterministic — Delta raises, so do we."""
    path = str(tmp_path / "dupsrc")
    write_delta(
        spark.createDataFrame([(1, 10, "a")], "id int, ver int, name string"), path
    )
    src = spark.createDataFrame(
        [(1, 98, "x"), (1, 99, "y")], "id int, ver int, name string"
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        DeltaTable(spark, path).merge(src, keys=["id"])
    # unmatched duplicate source keys are fine (pure insert)
    src2 = spark.createDataFrame(
        [(7, 1, "x"), (7, 2, "y")], "id int, ver int, name string"
    )
    DeltaTable(spark, path).merge(src2, keys=["id"])
    assert DeltaTable(spark, path).to_df().count() == 3


def test_update_mor_writes_dv_not_rewrites(spark, tmp_path):
    """MOR UPDATE: old row versions deletion-vectored in place, new versions
    appended; untouched physical files keep their identity (no rewrite)."""
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "morup")
    write_delta(
        spark.createDataFrame([(i, i % 3, float(i)) for i in range(90)],
                              "id int, k int, v double"),
        path,
        partition_by=["k"],
    )
    before = {f.path: f.modification_time for f in DeltaLog(path).snapshot().files}
    r = DeltaTable(spark, path).update({"v": "v * -1"}, where="id < 9", mode="mor")
    assert r["dv_files_written"] == 1
    snap = DeltaLog(path).snapshot()
    # surviving pre-existing files keep their physical identity (same bytes,
    # same mtime — only the DV descriptor changed); fully-consumed files may
    # drop wholesale, but none is ever rewritten
    for f in snap.files:
        if f.path in before:
            assert f.modification_time == before[f.path]
    assert any(f.path in before and f.deletion_vector for f in snap.files)
    assert "deletionVectors" in (snap.protocol.get("readerFeatures") or [])
    got = {r["id"]: r["v"] for r in DeltaTable(spark, path).to_df().collect()}
    assert len(got) == 90
    assert all(got[i] == -float(i) for i in range(9))
    assert all(got[i] == float(i) for i in range(9, 90))


def test_merge_mor_full_file_consumption_drops_file(spark, tmp_path):
    """A MOR matched-delete that consumes every row of a file drops the file
    (metadata-only) instead of writing an all-ones DV."""
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "morfull")
    write_delta(
        spark.createDataFrame([(i, i % 2) for i in range(10)], "id int, k int"),
        path,
        partition_by=["k"],
    )
    n_before = DeltaLog(path).snapshot().num_files
    # delete ALL even rows = every row of partition k=0
    src = spark.createDataFrame([(i, 0) for i in range(0, 10, 2)], "id int, k int")
    DeltaTable(spark, path).merge(
        src, keys=["id"], when_matched="delete", when_not_matched=None, mode="mor"
    )
    snap = DeltaLog(path).snapshot()
    assert DeltaTable(spark, path).to_df().count() == 5
    # no DV written: the k=0 files were fully consumed and dropped outright
    assert all(not f.deletion_vector for f in snap.files)
    assert snap.num_files < n_before


def test_parse_where_catalyst_rendered_forms():
    """The prune-triple grammar must cover BOTH hand-written conditions
    and Catalyst's Column.sql() renderings (every node parenthesized,
    backticked identifiers, suffixed/typed literals) — the pond.sql
    DELETE/UPDATE routes pass the rendered text, and before round 9 it
    failed the conjunct regex wholesale: zero file pruning on every
    SQL-route DML. fully_parsed=True gates metadata-only answers, so
    every new accepted form here must be an EXACT conjunct."""
    from athena_delta_lake_spark.delta.table import _parse_where_full as P

    cases = [
        ("(id = 5000)", ([("id", "=", 5000)], True)),
        ("((id >= 10) AND (id < 20))", ([("id", ">=", 10), ("id", "<", 20)], True)),
        ("(`id` = 5000)", ([("id", "=", 5000)], True)),
        ("(day = DATE '2024-01-01')", ([("day", "=", "2024-01-01")], True)),
        (
            "(ts < TIMESTAMP '2024-01-01 00:00:00')",
            ([("ts", "<", "2024-01-01 00:00:00")], True),
        ),
        ("(price > 1.5BD)", ([("price", ">", 1.5)], True)),
        ("(n = 5000000000L)", ([("n", "=", 5000000000)], True)),
        ("(flag = true)", ([("flag", "=", True)], True)),
        ("(name = 'x\\'y')", ([("name", "=", "x'y")], True)),
        ("name = 'x''y'", ([("name", "=", "x'y")], True)),
        ("(id IN (1, 2, 3))", ([("id", "in", [1, 2, 3])], True)),
        ("(name IN ('a', 'b'))", ([("name", "in", ["a", "b"])], True)),
        # OR poisons only its own subtree: the sibling conjunct still
        # prunes, fully=False keeps the metadata-only paths off
        (
            "((id = 5000) AND ((name = 'a') OR (name = 'b')))",
            ([("id", "=", 5000)], False),
        ),
        ("a = 1 OR b = 2", ([], False)),
        ("NOT (a = 1)", ([], False)),
        (
            "(a = 1 AND b = 2) AND c = 3",
            ([("a", "=", 1), ("b", "=", 2), ("c", "=", 3)], True),
        ),
        ("name = 'has AND inside'", ([("name", "=", "has AND inside")], True)),
        ("id % 2 = 1 AND k = 3", ([("k", "=", 3)], False)),
        ("(name = 'x\\ny')", ([], False)),  # unknown escape: never guess
        ("day <> '2024-01-01'", ([("day", "!=", "2024-01-01")], True)),
        ("(x.id = 7)", ([], False)),  # qualified name: conservative
        ("true", ([], False)),
    ]
    for expr, want in cases:
        assert P(expr) == want, (expr, P(expr), want)


def test_sql_route_delete_prunes_and_matches_api(spark, tmp_path):
    """pond.sql DELETE (Catalyst-rendered condition) must produce the
    same result as the direct API, and its rendered predicate must reach
    the partition fast path (metadata-only drop, no rewrite)."""
    import os

    from athena_delta_lake_spark import DeltaPond

    root = tmp_path / "pond"
    os.makedirs(root / "s")
    path = str(root / "s" / "t")
    write_delta(
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(200)],
            "id long, part int, v double",
        ),
        path,
        partition_by=["part"],
    )
    pond = DeltaPond(spark, str(root))
    res = pond.sql("DELETE FROM s.t WHERE part = 2").collect()[0].asDict()
    # partition fast path: whole files dropped, nothing rewritten
    assert res["files_added"] == 0 and res["files_removed"] > 0
    assert DeltaTable(spark, path).to_df().filter("part = 2").count() == 0
    assert DeltaTable(spark, path).to_df().count() == 150


def test_sql_delete_on_decimal_partition_is_exact(spark, tmp_path):
    """Catalyst renders decimal literals as `0.10BD`; the parsed float
    must compare EXACTLY against DECIMAL partition values (a float-vs-
    Decimal mismatch used to prune the matching partition away: DELETE
    deleted nothing, and the negated predicate wholesale-dropped rows
    the predicate excluded)."""
    import os
    from decimal import Decimal

    from athena_delta_lake_spark import DeltaPond

    root = tmp_path / "pond"
    os.makedirs(root / "s")
    path = str(root / "s" / "t")
    df = spark.createDataFrame(
        [(i, Decimal(("0.10", "0.25", "1.50")[i % 3])) for i in range(90)],
        "id long, price decimal(10,2)",
    )
    write_delta(df, path, partition_by=["price"])
    pond = DeltaPond(spark, str(root))

    pond.sql("DELETE FROM s.t WHERE price = 0.10")
    t = DeltaTable(spark, path)
    assert t.to_df().filter("price = 0.10").count() == 0
    assert t.to_df().count() == 60

    # negated predicate: must NOT touch the remaining 0.25 rows' peers —
    # deletes exactly the non-0.25 rows
    pond.sql("DELETE FROM s.t WHERE price != 0.25")
    assert sorted(
        r["price"] for r in t.to_df().select("price").distinct().collect()
    ) == [Decimal("0.25")]
    assert t.to_df().count() == 30


def test_parse_literal_rejects_unrepresentable_decimals():
    """A decimal literal beyond float precision must bail (conservative)
    rather than round into a pruning value."""
    from athena_delta_lake_spark.delta.table import _parse_where_full as P

    assert P("(price = 0.10BD)") == ([("price", "=", 0.1)], True)
    preds, fully = P("(price = 0.100000000000000005551BD)")
    assert preds == [] and not fully


def test_api_string_predicate_on_decimal_partition(spark, tmp_path):
    """Direct-API string literal against a DECIMAL partition column:
    Decimal('0.10') must match the partition value exactly (strings used
    to pass _coerce untouched and mis-prune everything; ranges raised
    TypeError)."""
    from decimal import Decimal

    path = str(tmp_path / "decstr")
    df = spark.createDataFrame(
        [(i, Decimal(("0.10", "0.25")[i % 2])) for i in range(40)],
        "id long, price decimal(10,2)",
    )
    write_delta(df, path, partition_by=["price"])
    t = DeltaTable(spark, path)
    res = t.delete(where="price = '0.10'")
    assert res["rows_deleted"] == 20
    assert t.to_df().count() == 20
    # range op on the same column must not raise and must be exact
    assert t.to_df(where=[("price", ">", "0.20")]).count() == 20
    assert t.to_df(where=[("price", "<", "0.20")]).count() == 0
