"""Arbitrary MERGE ON (round-7 ask #2): differently-named equi-keys
(`ON t.id = s.src_id`) and residual non-equi conjuncts (`AND t.ds BETWEEN
s.lo AND s.hi`) in both the API (merge_upsert source_keys/on_condition)
and the SQL route (_merge_on decomposition).

Residual semantics are TRUE ON semantics: a (target, source) pair matches
only when the equi-keys AND the residual hold — a source row whose key
exists but whose residual fails is NOT MATCHED and inserts (unlike a
matched-clause condition, under which it would be swallowed)."""

from __future__ import annotations

import pytest

from athena_delta_lake_spark import write_delta
from athena_delta_lake_spark.catalog import DeltaPond
from athena_delta_lake_spark.delta.table import DeltaTable


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture
def pond(spark, tmp_path):
    p = DeltaPond(spark, str(tmp_path / "pond"))
    p.sql("CREATE SCHEMA lake")
    return p


# ------------------------------------------------- differently-named keys


def test_api_source_keys_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(2, "B"), (9, "I")], "src_id long, v string"
    )
    t.merge(src, keys=["id"], source_keys=["src_id"])
    assert _rows(t.to_df(), "id", "v") == [
        (1, "a"), (2, "B"), (3, "c"), (9, "I"),
    ]


def test_api_source_keys_ambiguous_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "id long, v string"), path)
    src = spark.createDataFrame(
        [(1, 7, "x")], "src_id long, id long, v string"
    )
    with pytest.raises(ValueError, match="ambiguous"):
        DeltaTable(spark, path).merge(
            src, keys=["id"], source_keys=["src_id"]
        )


def test_api_source_keys_mor(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        ).coalesce(1),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame([(2, "B"), (5, "E")], "k long, v string")
    t.merge(src, keys=["id"], source_keys=["k"], mode="mor")
    assert _rows(t.to_df(), "id", "v") == [
        (1, "a"), (2, "B"), (3, "c"), (5, "E"),
    ]
    assert any(f.deletion_vector for f in t.snapshot().files)


# --------------------------------------------------- residual ON conjuncts


def test_api_residual_true_on_semantics(spark, tmp_path):
    """Key matches but residual fails -> the source row INSERTS (true ON
    semantics), unlike matched_condition which keeps it out entirely."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "id long, ts long, v string"
        ),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(1, 11, "A"), (2, 5, "OLD")], "id long, ts long, v string"
    )
    # pair matches only when the source is NEWER than the target
    t.merge(src, keys=["id"], on_condition="s.ts > t.ts")
    got = _rows(t.to_df(), "id", "ts", "v")
    # id=1: matched (11 > 10) -> updated; id=2: key exists but 5 < 20 ->
    # NOT matched -> target row kept AND source row inserted
    assert got == [(1, 11, "A"), (2, 5, "OLD"), (2, 20, "b")]


def test_api_residual_vs_matched_condition_differ(spark, tmp_path):
    """The same predicate as matched_condition swallows the stale source
    row — proving the two paths are genuinely different."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "id long, ts long, v string"
        ),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(1, 11, "A"), (2, 5, "OLD")], "id long, ts long, v string"
    )
    t.merge(src, keys=["id"], matched_condition="s.ts > t.ts")
    assert _rows(t.to_df(), "id", "ts", "v") == [(1, 11, "A"), (2, 20, "b")]


def test_api_residual_range_join_disjoint_not_ambiguous(spark, tmp_path):
    """Two source rows sharing a key but covering DISJOINT ranges update
    different target rows — the pair-level ambiguity check must allow it
    (the key-level check would falsely reject)."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [("k", 5, "lo"), ("k", 50, "hi")], "g string, x long, v string"
        ),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [("k", 0, 10, "LOW"), ("k", 40, 60, "HIGH")],
        "g string, lo long, hi long, nv string",
    )
    t.merge(
        src.selectExpr("g", "lo", "hi", "nv as v", "lo as x"),
        keys=["g"],
        on_condition="t.x BETWEEN s.lo AND s.hi",
        when_not_matched=None,
    )
    got = {r["x"]: r["v"] for r in t.to_df().collect()}
    # updates take the source row's values for source-present columns
    assert got[0] == "LOW" and got[40] == "HIGH"


def test_api_residual_overlapping_pairs_ambiguous(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([("k", 5, "a")], "g string, x long, v string"),
        path,
    )
    src = spark.createDataFrame(
        [("k", 0, 10, "A"), ("k", 3, 7, "B")],
        "g string, lo long, hi long, v string",
    ).selectExpr("g", "lo", "hi", "v", "lo as x")
    with pytest.raises(ValueError, match="multiple source rows"):
        DeltaTable(spark, path).merge(
            src,
            keys=["g"],
            on_condition="t.x BETWEEN s.lo AND s.hi",
            when_not_matched=None,
        )


def test_api_residual_insert_only(spark, tmp_path):
    """Insert-only merge with a residual: dedup window — only rows with
    no (key, close-enough-ts) match insert."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, 100), (2, 200)], "id long, ts long"), path
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(1, 101), (2, 900), (3, 50)], "id long, ts long"
    )
    t.merge(
        src,
        keys=["id"],
        on_condition="abs(s.ts - t.ts) <= 10",
        when_matched=None,
        matched_clauses=[],
        when_not_matched="insert",
    )
    got = _rows(t.to_df(), "id", "ts")
    # (1,101) matched within the window -> skipped; (2,900) outside ->
    # inserted; (3,50) new key -> inserted
    assert got == [(1, 100), (2, 200), (2, 900), (3, 50)]


def test_api_residual_by_source_delete(spark, tmp_path):
    """NOT MATCHED BY SOURCE DELETE under a residual: target rows no pair
    matches are dropped."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, 10, "a"), (1, 99, "b"), (2, 10, "c")],
            "id long, ts long, v string",
        ).coalesce(1),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame([(1, 10, "A")], "id long, ts long, v string")
    t.merge(
        src,
        keys=["id"],
        on_condition="t.ts = s.ts",
        when_matched="update",
        when_not_matched=None,
        not_matched_by_source="delete",
    )
    assert _rows(t.to_df(), "id", "ts", "v") == [(1, 10, "A")]


def test_api_mor_refuses_residual(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, "a")], "id long, v string"), path)
    with pytest.raises(ValueError, match="merge-on-read"):
        DeltaTable(spark, path).merge(
            spark.createDataFrame([(1, "b")], "id long, v string"),
            keys=["id"],
            on_condition="t.v <> s.v",
            mode="mor",
        )


# --------------------------------------------------------------- SQL route


def test_sql_merge_differently_named_keys(spark, pond):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).createOrReplaceTempView("mo_t")
    pond.sql("CREATE TABLE lake.t AS SELECT * FROM mo_t")
    spark.createDataFrame(
        [(2, "B"), (7, "G")], "src_id long, v string"
    ).createOrReplaceTempView("mo_s")
    pond.sql(
        "MERGE INTO lake.t USING mo_s s ON lake.t.id = s.src_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = _rows(pond.sql("SELECT id, v FROM lake.t"), "id", "v")
    assert got == [(1, "a"), (2, "B"), (7, "G")]


def test_sql_merge_residual_range_conjunct(spark, pond):
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "id long, ts long, v string"
    ).createOrReplaceTempView("mr_t")
    pond.sql("CREATE TABLE lake.r AS SELECT * FROM mr_t")
    spark.createDataFrame(
        [(1, 11, "A"), (2, 5, "OLD")], "id long, ts long, v string"
    ).createOrReplaceTempView("mr_s")
    pond.sql(
        "MERGE INTO lake.r t USING mr_s s "
        "ON t.id = s.id AND s.ts > t.ts "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = _rows(pond.sql("SELECT id, ts, v FROM lake.r"), "id", "ts", "v")
    assert got == [(1, 11, "A"), (2, 5, "OLD"), (2, 20, "b")]


def test_sql_merge_renamed_key_plus_residual_and_condition(spark, pond):
    """Renamed key + residual + a matched-clause condition referencing
    the renamed source key (must be rewritten to the target name)."""
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        "id long, ts long, v string",
    ).createOrReplaceTempView("mx_t")
    pond.sql("CREATE TABLE lake.x AS SELECT * FROM mx_t")
    spark.createDataFrame(
        [(1, 15, "A"), (2, 25, "DEL"), (3, 1, "STALE")],
        "key long, ts long, v string",
    ).createOrReplaceTempView("mx_s")
    pond.sql(
        "MERGE INTO lake.x t USING mx_s s "
        "ON t.id = s.key AND s.ts > t.ts "
        "WHEN MATCHED AND s.key = 2 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = _rows(pond.sql("SELECT id, ts, v FROM lake.x"), "id", "ts", "v")
    # id=1 matched+updated; id=2 matched by the DELETE clause; id=3 pair
    # fails residual -> target kept, source inserted
    assert got == [(1, 15, "A"), (3, 1, "STALE"), (3, 30, "c")]


def test_sql_merge_residual_on_dv_table_routes_cow(spark, pond):
    """A deletion-vector-mode table with a residual ON routes through the
    COW engine (correct, documented) instead of erroring."""
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "id long, ts long, v string"
    ).createOrReplaceTempView("md_t")
    pond.sql(
        "CREATE TABLE lake.d "
        "TBLPROPERTIES ('delta.enableDeletionVectors' = 'true') "
        "AS SELECT * FROM md_t"
    )
    spark.createDataFrame(
        [(1, 99, "NEW")], "id long, ts long, v string"
    ).createOrReplaceTempView("md_s")
    pond.sql(
        "MERGE INTO lake.d t USING md_s s ON t.id = s.id AND s.ts > t.ts "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = _rows(pond.sql("SELECT id, ts, v FROM lake.d"), "id", "ts", "v")
    assert got == [(1, 99, "NEW"), (2, 20, "b")]


def test_sql_merge_no_equi_key_refused(spark, pond):
    spark.createDataFrame([(1, "a")], "id long, v string").createOrReplaceTempView(
        "mn_t"
    )
    pond.sql("CREATE TABLE lake.n AS SELECT * FROM mn_t")
    with pytest.raises(ValueError, match="at least one"):
        pond.sql(
            "MERGE INTO lake.n t USING mn_t s ON t.id > s.id "
            "WHEN MATCHED THEN UPDATE SET *"
        )


# ----------------------------------- per-column UPDATE SET col = expr (r7)


def test_api_merge_assignments_cow(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
            "id long, n long, v string",
        ),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(1, 5, "X"), (9, 9, "NEW")], "id long, n long, v string"
    )
    # assigned expr mixes both sides; unassigned v keeps the TARGET value
    t.merge(
        src,
        keys=["id"],
        matched_clauses=[(None, "update", {"n": "t.n + s.n"})],
        when_not_matched="insert",
    )
    got = _rows(t.to_df(), "id", "n", "v")
    assert got == [(1, 15, "a"), (2, 20, "b"), (3, 30, "c"), (9, 9, "NEW")]


def test_api_merge_assignments_mor_and_conditional(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, 40, "z")],
            "id long, n long, v string",
        ).coalesce(1),
        path,
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(1, 100, "u"), (2, 200, "d"), (3, 300, "u")],
        "id long, n long, v string",
    )
    t.merge(
        src,
        keys=["id"],
        matched_clauses=[
            ("s.v = 'd'", "delete"),
            (None, "update", {"v": "upper(s.v)", "n": "s.n - t.n"}),
        ],
        when_not_matched=None,
        mode="mor",
    )
    got = _rows(t.to_df(), "id", "n", "v")
    assert got == [(1, 90, "U"), (3, 270, "U"), (4, 40, "z")]
    assert any(f.deletion_vector for f in t.snapshot().files)


def test_sql_merge_per_column_set(spark, pond):
    spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, n long"
    ).createOrReplaceTempView("pcs_t")
    pond.sql("CREATE TABLE lake.pc AS SELECT * FROM pcs_t")
    spark.createDataFrame(
        [(1, 7), (5, 50)], "id long, n long"
    ).createOrReplaceTempView("pcs_s")
    pond.sql(
        "MERGE INTO lake.pc t USING pcs_s s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET n = t.n + s.n "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = _rows(pond.sql("SELECT id, n FROM lake.pc"), "id", "n")
    assert got == [(1, 17), (2, 20), (5, 50)]


def test_sql_merge_per_column_set_with_renamed_key(spark, pond):
    """Assignments referencing the renamed source key are rewritten to
    the target name (the source frame is renamed before the engine)."""
    spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, n long"
    ).createOrReplaceTempView("pcr_t")
    pond.sql("CREATE TABLE lake.pr AS SELECT * FROM pcr_t")
    spark.createDataFrame(
        [(1, 3)], "sid long, n long"
    ).createOrReplaceTempView("pcr_s")
    pond.sql(
        "MERGE INTO lake.pr t USING pcr_s s ON t.id = s.sid "
        "WHEN MATCHED THEN UPDATE SET n = s.sid * 100 + s.n"
    )
    got = _rows(pond.sql("SELECT id, n FROM lake.pr"), "id", "n")
    assert got == [(1, 103), (2, 20)]


# -------------------------------- WHEN NOT MATCHED AND cond THEN INSERT


def test_api_conditional_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, 10)], "id long, n long"), path
    )
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(1, 99), (2, 5), (3, 50)], "id long, n long"
    )
    t.merge(src, keys=["id"], not_matched_condition="s.n >= 10")
    got = _rows(t.to_df(), "id", "n")
    # id=1 matched -> updated; id=2 unmatched but n<10 -> dropped;
    # id=3 unmatched and n>=10 -> inserted
    assert got == [(1, 99), (3, 50)]


def test_api_conditional_insert_only_fast_path(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, 10)], "id long, n long"), path)
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(1, 99), (2, 5), (3, 50)], "id long, n long"
    )
    t.merge(
        src,
        keys=["id"],
        when_matched=None,
        matched_clauses=[],
        not_matched_condition="s.n >= 10",
    )
    assert _rows(t.to_df(), "id", "n") == [(1, 10), (3, 50)]


def test_sql_conditional_insert(spark, pond):
    spark.createDataFrame([(1, 10)], "id long, n long").createOrReplaceTempView(
        "ci_t"
    )
    pond.sql("CREATE TABLE lake.ci AS SELECT * FROM ci_t")
    spark.createDataFrame(
        [(1, 99), (2, 5), (3, 50)], "id long, n long"
    ).createOrReplaceTempView("ci_s")
    pond.sql(
        "MERGE INTO lake.ci t USING ci_s s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.n >= 10 THEN INSERT *"
    )
    got = _rows(pond.sql("SELECT id, n FROM lake.ci"), "id", "n")
    assert got == [(1, 99), (3, 50)]


def test_sql_multiple_conditional_inserts_or_semantics(spark, pond):
    """Second-review finding: N conditional WHEN NOT MATCHED INSERT *
    clauses reduce to OR-ed conditions (each inserts the same row), not
    last-clause-wins."""
    spark.createDataFrame([(1, 10, 0)], "id long, n long, flag int").createOrReplaceTempView(
        "mo2_t"
    )
    pond.sql("CREATE TABLE lake.m2 AS SELECT * FROM mo2_t")
    spark.createDataFrame(
        [(2, 50, 0), (3, 5, 1), (4, 5, 0)], "id long, n long, flag int"
    ).createOrReplaceTempView("mo2_s")
    pond.sql(
        "MERGE INTO lake.m2 t USING mo2_s s ON t.id = s.id "
        "WHEN NOT MATCHED AND s.n >= 10 THEN INSERT * "
        "WHEN NOT MATCHED AND s.flag = 1 THEN INSERT *"
    )
    got = _rows(pond.sql("SELECT id FROM lake.m2"), "id")
    # id=2 (n>=10) and id=3 (flag) insert; id=4 matches neither
    assert got == [(1,), (2,), (3,)]


def test_assignment_referencing_missing_source_col_refused(spark, tmp_path):
    """Second-review finding: a narrow source may omit only columns the
    SET expressions do NOT reference — 'SET v = s.v' with no source v
    must raise, not silently write NULL."""
    path = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, 9.0)], "id long, v double"), path
    )
    src = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing target columns"):
        DeltaTable(spark, path).merge(
            src,
            keys=["id"],
            matched_clauses=[(None, "update", {"v": "s.v"})],
            when_not_matched=None,
        )
    # ...while an assignment NOT referencing s.v works with the same source
    DeltaTable(spark, path).merge(
        src,
        keys=["id"],
        matched_clauses=[(None, "update", {"v": "t.v + 1"})],
        when_not_matched=None,
    )
    assert DeltaTable(spark, path).to_df().first()["v"] == 10.0


def test_dead_not_matched_condition_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, 9.0)], "id long, v double"), path)
    with pytest.raises(ValueError, match="not_matched_condition"):
        DeltaTable(spark, path).merge(
            spark.createDataFrame([(1, 0.0)], "id long, v double"),
            keys=["id"],
            when_not_matched=None,
            not_matched_condition="s.v > 0",
        )
