"""Multi-clause MERGE: ordered WHEN MATCHED [AND cond] THEN UPDATE|DELETE
chains, first-match-wins per target row — the standard CDC-apply shape —
in both copy-on-write and merge-on-read modes."""

import pytest

from athena_delta_lake_spark.delta import DeltaTable, write_delta
from athena_delta_lake_spark.delta.dml import merge_upsert, merge_upsert_mor


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "mc_tbl")
    df = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(10)],
        "id long, name string, v double",
    ).coalesce(2)
    write_delta(df, path)
    return path


def _rows(spark, path):
    return {
        (r["id"], r["name"], r["v"])
        for r in DeltaTable(spark, path).to_df().collect()
    }


def _cdc_source(spark):
    # id 2,4: tombstones (negative v -> delete clause); id 6,8: updates;
    # id 100: brand-new key (insert)
    return spark.createDataFrame(
        [
            (2, "dead", -1.0),
            (4, "dead", -2.0),
            (6, "upd6", 60.0),
            (8, "upd8", 80.0),
            (100, "new", 1.0),
        ],
        "id long, name string, v double",
    )


EXPECTED_CDC = (
    {(i, f"u{i}", float(i)) for i in range(10) if i not in (2, 4, 6, 8)}
    | {(6, "upd6", 60.0), (8, "upd8", 80.0), (100, "new", 1.0)}
)


@pytest.mark.parametrize("merge_fn", [merge_upsert, merge_upsert_mor])
def test_cdc_delete_then_update_chain(spark, tbl, merge_fn):
    res = merge_fn(
        spark,
        tbl,
        _cdc_source(spark),
        ["id"],
        matched_clauses=[("s.v < 0", "delete"), (None, "update")],
    )
    assert _rows(spark, tbl) == EXPECTED_CDC
    assert res["files_added"] >= 1


def test_first_match_wins_ordering(spark, tbl):
    # v=200 satisfies BOTH conditions; clause order decides: update wins
    src = spark.createDataFrame(
        [(3, "big", 200.0), (5, "mid", 50.0)], "id long, name string, v double"
    )
    merge_upsert(
        spark,
        tbl,
        src,
        ["id"],
        when_not_matched=None,
        matched_clauses=[("s.v > 100", "update"), ("s.v > 10", "delete")],
    )
    got = _rows(spark, tbl)
    assert (3, "big", 200.0) in got  # first clause (update) won
    assert not any(i == 5 for i, _n, _v in got)  # second clause deleted it
    assert len(got) == 9


def test_no_clause_matches_keeps_target(spark, tbl):
    src = spark.createDataFrame(
        [(7, "ignored", 5.0)], "id long, name string, v double"
    )
    merge_upsert(
        spark,
        tbl,
        src,
        ["id"],
        when_not_matched=None,
        matched_clauses=[("s.v > 100", "update"), ("s.v < 0", "delete")],
    )
    assert (7, "u7", 7.0) in _rows(spark, tbl)  # target version survived


def test_clause_validation(spark, tbl):
    src = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, v double")
    with pytest.raises(ValueError, match="update|delete"):
        merge_upsert(
            spark, tbl, src, ["id"], matched_clauses=[(None, "upsert")]
        )
    with pytest.raises(ValueError, match="unconditional"):
        merge_upsert(
            spark,
            tbl,
            src,
            ["id"],
            matched_clauses=[(None, "delete"), ("s.v > 0", "update")],
        )
    with pytest.raises(ValueError, match="matched_clauses"):
        merge_upsert(
            spark,
            tbl,
            src,
            ["id"],
            matched_condition="s.v > 0",
            matched_clauses=[(None, "update")],
        )


def test_mor_multi_clause_cdf_shows_per_clause_changes(spark, tbl):
    """CDF granularity: keys hit by the DELETE clause appear as
    delete-only; UPDATE-clause keys as delete (old version) + insert
    (new version); fresh keys as insert-only."""
    from athena_delta_lake_spark.delta.cdf import table_changes

    v = merge_upsert_mor(
        spark,
        tbl,
        _cdc_source(spark),
        ["id"],
        matched_clauses=[("s.v < 0", "delete"), (None, "update")],
    )
    assert v  # merged
    last = DeltaTable(spark, tbl).version()
    ch = table_changes(spark, tbl, last, last).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], set()).add(r["id"])
    assert by_type["delete"] == {2, 4, 6, 8}  # both clauses kill old versions
    assert by_type["insert"] == {6, 8, 100}  # only updates + fresh inserts


def test_multi_clause_row_tracking_identity(spark, tbl):
    """Update-clause rows keep their row id; delete-clause rows' ids
    disappear; inserted rows mint fresh ids."""
    from athena_delta_lake_spark.delta import enable_row_tracking

    enable_row_tracking(tbl)
    t = DeltaTable(spark, tbl)
    before = {
        r["id"]: r["_row_id"] for r in t.to_df_with_row_ids().collect()
    }
    merge_upsert_mor(
        spark,
        tbl,
        _cdc_source(spark),
        ["id"],
        matched_clauses=[("s.v < 0", "delete"), (None, "update")],
    )
    after = {r["id"]: r["_row_id"] for r in t.to_df_with_row_ids().collect()}
    assert after[6] == before[6] and after[8] == before[8]  # updates keep ids
    assert 2 not in after and 4 not in after
    assert after[100] not in set(before.values())  # fresh id
    assert len(set(after.values())) == len(after)


def test_insert_only_merge_allows_duplicate_matched_source(spark, tmp_path):
    """Insert-only MERGE (no matched clause) must not reject duplicate
    matched source keys and must not rewrite any target file."""
    from athena_delta_lake_spark.delta import dml
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "io")
    write_delta(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double"), path
    )
    src = spark.createDataFrame(
        [(1, -1.0), (1, -2.0), (5, 50.0)], "id long, v double"
    )
    m = dml.merge_upsert(
        spark, path, src, keys=["id"], matched_clauses=[],
        when_not_matched="insert",
    )
    assert m["files_removed"] == 0  # no target file touched
    got = sorted(
        (r["id"], r["v"]) for r in DeltaTable(spark, path).to_df().collect()
    )
    assert got == [(1, 10.0), (2, 20.0), (5, 50.0)]
    # MOR variant takes the same fast path
    m2 = dml.merge_upsert_mor(
        spark, path, src, keys=["id"], matched_clauses=[],
        when_not_matched="insert",
    )
    assert m2["files_removed"] == 0
    info = DeltaLog(path).commit_actions(DeltaLog(path).latest_version())
    ops = [a["commitInfo"]["operationParameters"] for a in info if "commitInfo" in a]
    assert ops and ops[0].get("insertOnly") is True


def test_by_source_delete_without_matched_clause_keeps_matched(spark, tmp_path):
    from athena_delta_lake_spark.delta import dml

    path = str(tmp_path / "bs")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id long, v double"
        ),
        path,
    )
    src = spark.createDataFrame([(2, 0.0), (4, 0.0)], "id long, v double")
    dml.merge_upsert(
        spark, path, src, keys=["id"], matched_clauses=[],
        when_not_matched=None, not_matched_by_source="delete",
    )
    got = sorted(
        (r["id"], r["v"]) for r in DeltaTable(spark, path).to_df().collect()
    )
    assert got == [(2, 2.0), (4, 4.0)]  # matched keep TARGET version
