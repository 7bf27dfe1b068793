"""Round-9 fixes, each locking a VERDICT/ADVICE finding from round 8:

1. insert-only MERGE routes its anti-join scan through the source-key-
   range candidates instead of every live file (VERDICT "what's wrong" #1);
2. non-finite min/max parsed from FOREIGN stats are treated as missing
   (conservative keep) in both prune evaluators (ADVICE #3);
3. the streaming backlog warning no longer fires — nor pays its
   O(threshold) probe — on a committed checkpoint restart whose first
   engine call is latestOffset() (ADVICE #2).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta


@pytest.fixture
def pond(spark, tmp_path):
    from athena_delta_lake_spark.catalog import DeltaPond

    p = DeltaPond(spark, str(tmp_path / "pond"))
    p.sql("CREATE SCHEMA lake")
    return p


def test_insert_only_merge_prunes_by_source_key_range(spark, tmp_path):
    """The insert-only fast path's target key scan reads only files whose
    stats intersect the source's key min/max — and the result is
    identical to the unpruned semantics (pruned-out files provably hold
    no source key)."""
    from athena_delta_lake_spark.delta import dml

    path = str(tmp_path / "iokr")
    df = spark.range(1000).selectExpr("id", "id * 1.0 AS v").repartitionByRange(
        10, "id"
    )
    write_delta(df, path)
    t = DeltaTable(spark, path)
    assert len(t.snapshot().files) == 10

    seen: list[int] = []
    orig = dml._read_cow

    def spy(spark_, snap_, files, *a, **k):
        seen.append(len(files))
        return orig(spark_, snap_, files, *a, **k)

    dml._read_cow, real = spy, orig
    try:
        # keys 100..104 live in one range file; 2000.. are pure inserts
        src = spark.createDataFrame(
            [(100, -1.0), (104, -2.0), (2000, -3.0)], "id long, v double"
        )
        t.merge(src, keys=["id"], matched_clauses=[])  # insert-only
    finally:
        dml._read_cow = real
    assert seen and max(seen) < 10, seen  # scanned candidates, not the table
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    # matched keys did NOT insert (they exist); unmatched did
    assert len(rows) == 1001 and rows[100] == 100.0 and rows[2000] == -3.0

    # residual-ON branch prunes too (equi-keys still conjoin the pair)
    seen.clear()
    dml._read_cow = spy
    try:
        t.merge(
            spark.createDataFrame([(101, -4.0)], "id long, v double"),
            keys=["id"],
            matched_clauses=[],
            on_condition="t.v >= 0",
        )
    finally:
        dml._read_cow = real
    assert seen and max(seen) < 10, seen
    assert t.count() == 1001  # id=101 matched (v=101.0 >= 0): no insert


def _foreign_log_with_stats(root: str, stats_list: list[dict]) -> str:
    """A metadata-only Delta log whose adds carry hand-written stats —
    the foreign-writer shapes this engine must stay conservative on."""
    path = os.path.join(root, "foreign")
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "v", "type": "double", "nullable": True, "metadata": {}}
            ],
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "foreign",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_str,
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]
    for i, st in enumerate(stats_list):
        actions.append(
            {
                "add": {
                    "path": f"part-{i:05d}.parquet",
                    "partitionValues": {},
                    "size": 1024,
                    "modificationTime": 1,
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": 10, **st}),
                }
            }
        )
    with open(os.path.join(log_dir, "00000000000000000000.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return path


def test_nonfinite_foreign_stats_keep_the_file(spark, tmp_path):
    """A foreign-written add whose stats record NaN/±inf min/max must
    SURVIVE pruning (treated as missing stats): IEEE `nan >= x` is false,
    so the old evaluator pruned files that can contain matching rows
    (NaN == NaN in Spark joins) — silent duplicate inserts under MERGE.
    Both evaluators (driver loop + distributed Spark expression) agree."""
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.stats import (
        prune_files,
        prune_files_distributed,
    )

    path = _foreign_log_with_stats(
        str(tmp_path),
        [
            # json.dumps renders float('nan')/inf as NaN/Infinity literals
            # (python extension); json.loads parses them back — exactly
            # what a pyarrow/pandas-based foreign writer emits
            {"minValues": {"v": float("nan")}, "maxValues": {"v": float("nan")}},
            {"minValues": {"v": float("-inf")}, "maxValues": {"v": float("inf")}},
            {"minValues": {"v": 0.0}, "maxValues": {"v": 1.0}},  # prunable
            {"minValues": {}, "maxValues": {}},  # no stats: always kept
        ],
    )
    snap = DeltaLog(path).snapshot()
    for preds in (
        [("v", ">=", 100.0)],
        [("v", "=", 5.0)],
        [("v", "<", -100.0)],
        [("v", "in", [7.0, 8.0])],
    ):
        py = {f.path for f in prune_files(snap, preds)}
        dist = {f.path for f in prune_files_distributed(spark, snap, preds)}
        # non-finite-stats files + the stats-less file always survive
        assert {"part-00000.parquet", "part-00001.parquet",
                "part-00003.parquet"} <= py, (preds, py)
        assert py == dist, (preds, py, dist)
    # the finite-stats file still prunes exactly
    assert "part-00002.parquet" not in {
        f.path for f in prune_files(snap, [("v", ">=", 100.0)])
    }
    assert "part-00002.parquet" in {
        f.path for f in prune_files(snap, [("v", "=", 0.5)])
    }


def test_merge_key_range_pruning_timestamp_keys(spark, tmp_path):
    """Timestamp merge keys participate in key-range pruning (round-9 ask
    #4): the writer records aware-UTC isoformat stats (TIMESTAMP_MICROS
    parquet, session.py), the source's collected naive bounds are
    rendered into the same absolute domain, and files outside the
    source's time range survive the merge BY IDENTITY (never probed,
    never rewritten)."""
    import datetime

    from athena_delta_lake_spark.delta.dml import _merge_key_range_candidates
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "tskr")
    base = datetime.datetime(2024, 1, 1)
    df = spark.range(1000).selectExpr(
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id*3600) AS ts",
        "id * 1.0 AS v",
    ).repartitionByRange(10, "ts")
    write_delta(df, path)
    snap = DeltaLog(path).snapshot()
    assert len(snap.files) == 10
    # every file carries aware-UTC isoformat ts stats
    assert all(
        "+00:00" in (f.stats or {}).get("minValues", {}).get("ts", "")
        for f in snap.files
    )
    src = spark.createDataFrame(
        [
            (base + datetime.timedelta(hours=500), -1.0),
            (base + datetime.timedelta(hours=501), -2.0),
        ],
        "ts timestamp, v double",
    )
    cands = _merge_key_range_candidates(spark, snap, src, ["ts"])
    assert 1 <= len(cands) < 10, len(cands)  # pruned to the narrow range

    # end-to-end identity: one file rewritten, nine untouched
    t = DeltaTable(spark, path)
    before = {f.path for f in snap.files}
    t.merge(
        spark.createDataFrame(
            [
                (base + datetime.timedelta(hours=500), -1.0),
                (base + datetime.timedelta(days=400), -9.0),  # insert
            ],
            "ts timestamp, v double",
        ),
        keys=["ts"],
    )
    after = {f.path for f in t.snapshot().files}
    assert len(before & after) == 9, len(before & after)
    rows = {r["ts"]: r["v"] for r in t.to_df().collect()}
    assert len(rows) == 1001
    assert rows[base + datetime.timedelta(hours=500)] == -1.0
    assert rows[base + datetime.timedelta(days=400)] == -9.0

    # all-NULL timestamp bounds bail to the full list (conservative)
    nsrc = spark.createDataFrame(
        [(None, 0.0)], "ts timestamp, v double"
    )
    assert len(_merge_key_range_candidates(spark, snap, nsrc, ["ts"])) == 10


def test_merge_ts_bounds_immune_to_session_vs_os_timezone(spark, tmp_path):
    """Regression (round-9 review): collect() renders TimestampType via
    datetime.fromtimestamp, i.e. the DRIVER OS timezone — NOT the session
    timezone. The old bound path re-attached the SESSION tz to that
    OS-rendered naive wall clock, so whenever the two differed every
    timestamp merge bound shifted by the offset delta and pruning could
    drop files that DO contain matching rows (silent duplicate inserts).
    Bounds now travel as unix_micros (absolute, tz-free); with session tz
    forced to America/Los_Angeles on a UTC host the computed bound must
    still equal the true instant exactly."""
    import datetime

    from athena_delta_lake_spark.delta.dml import _source_key_bound_preds
    from athena_delta_lake_spark.delta.log import DeltaLog

    utc = datetime.timezone.utc
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        path = str(tmp_path / "tzmerge")
        df = spark.range(240).selectExpr(
            "timestamp'2024-06-01 00:00:00' + "
            "make_interval(0,0,0,0,0,0,id*3600) AS ts",
            "id * 1.0 AS v",
        ).repartitionByRange(10, "ts")
        write_delta(df, path)
        snap = DeltaLog(path).snapshot()

        # unit: an aware-UTC source instant must round-trip exactly
        inst = datetime.datetime(2024, 6, 5, 12, 0, tzinfo=utc)
        src = spark.createDataFrame([(inst, -1.0)], "ts timestamp, v double")
        preds = {(k, op): v for k, op, v in
                 _source_key_bound_preds(spark, snap.schema, src, ["ts"])}
        assert preds[("ts", ">=")] == inst, preds[("ts", ">=")]
        assert preds[("ts", "<=")] == inst, preds[("ts", "<=")]

        # end-to-end: merging an existing instant under the mismatched tz
        # updates in place (no duplicate key, no lost update)
        t = DeltaTable(spark, path)
        existing = t.to_df().orderBy("ts").limit(1).collect()[0]["ts"]
        n_before = t.to_df().count()
        esrc = spark.createDataFrame(
            [(existing, -42.0)], "ts timestamp, v double"
        )
        t.merge(esrc, keys=["ts"])
        got = t.to_df().where(F.col("ts") == F.lit(existing)).collect()
        assert len(got) == 1, got  # no duplicate insert
        assert got[0]["v"] == -42.0  # update not lost
        assert t.to_df().count() == n_before
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_timestamp_scan_pruning_stats_recorded(spark, tmp_path):
    """TIMESTAMP_MICROS output (session.py) gives ordinary time-range
    scans data skipping too: the distributed prune evaluates aware-UTC
    stats strings against timestamp predicates exactly."""
    import datetime

    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.stats import prune_files_distributed

    path = str(tmp_path / "tsscan")
    df = spark.range(240).selectExpr(
        "timestamp'2024-03-01' + make_interval(0,0,0,0,id,0,0) AS ts", "id"
    ).repartitionByRange(6, "ts")
    write_delta(df, path)
    snap = DeltaLog(path).snapshot()
    lo = datetime.datetime(
        2024, 3, 8, tzinfo=datetime.timezone.utc
    )
    kept = prune_files_distributed(spark, snap, [("ts", ">=", lo)])
    assert 1 <= len(kept) < len(snap.files)
    # identity: pruned scan == full-scan filter
    t = DeltaTable(spark, path)
    want = t.to_df().filter("ts >= timestamp'2024-03-08'").count()
    got = t.to_df(predicates=[("ts", ">=", lo)]).filter(
        "ts >= timestamp'2024-03-08'"
    ).count()
    assert got == want == 240 - 7 * 24


# ----------------- WHEN NOT MATCHED BY SOURCE: UPDATE + conditions -------


def _range_table(spark, path: str, n=1000, files=10):
    df = spark.range(n).selectExpr("id", "id * 1.0 AS v").repartitionByRange(
        files, "id"
    )
    write_delta(df, path)
    return DeltaTable(spark, path)


def test_nmbs_conditional_delete_cow(spark, tmp_path):
    """`WHEN NOT MATCHED BY SOURCE AND t.id >= 950 THEN DELETE` (the
    retention idiom): unmatched rows pass/fail the condition row-wise,
    and files the condition provably cannot reach survive BY IDENTITY
    (no wholesale drop, no blanket rewrite)."""
    path = str(tmp_path / "nmbs_cd")
    t = _range_table(spark, path)
    before = {f.path for f in t.snapshot().files}
    src = spark.createDataFrame([(5, -1.0), (960, -2.0)], "id long, v double")
    m = t.merge(
        src,
        keys=["id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="t.id >= 950",
    )
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    # matched rows updated; unmatched >= 950 deleted; the rest kept
    assert rows[5] == -1.0 and rows[960] == -2.0
    assert len(rows) == 951  # 0..949 (950 rows) plus matched id=960
    assert 951 not in rows and 949 in rows
    after = {f.path for f in t.snapshot().files}
    # only the probe-touched file (id=5) and the condition-reachable
    # file (ids 900..999) were rewritten; eight files survive
    assert len(before & after) == 8, len(before & after)
    assert m["files_removed"] == 2


def test_nmbs_conditional_update_cow(spark, tmp_path):
    """`WHEN NOT MATCHED BY SOURCE AND t.id >= 990 THEN UPDATE SET
    v = -t.v` rewrites only condition-reachable files; unmatched rows
    failing the condition keep their version."""
    path = str(tmp_path / "nmbs_cu")
    t = _range_table(spark, path)
    before = {f.path for f in t.snapshot().files}
    src = spark.createDataFrame([(5, -1.0), (991, 0.5)], "id long, v double")
    t.merge(
        src,
        keys=["id"],
        not_matched_by_source="update",
        not_matched_by_source_condition="t.id >= 990",
        not_matched_by_source_assigns={"v": "-t.v"},
    )
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert len(rows) == 1000
    assert rows[5] == -1.0 and rows[991] == 0.5  # matched: source wins
    assert rows[990] == -990.0 and rows[999] == -999.0  # by-source updated
    assert rows[989] == 989.0 and rows[0] == 0.0  # condition false: kept
    after = {f.path for f in t.snapshot().files}
    assert len(before & after) == 8, len(before & after)


def test_nmbs_unconditional_update_cow(spark, tmp_path):
    """Unconditional BY SOURCE UPDATE rewrites every live file (inherent:
    every unmatched row changes) — and every unmatched row is assigned."""
    path = str(tmp_path / "nmbs_uu")
    t = _range_table(spark, path, n=100, files=4)
    src = spark.createDataFrame([(7, -1.0)], "id long, v double")
    t.merge(
        src,
        keys=["id"],
        not_matched_by_source="update",
        not_matched_by_source_assigns={"v": "t.v + 1000"},
    )
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert rows[7] == -1.0
    assert all(rows[i] == i + 1000.0 for i in range(100) if i != 7)


def test_nmbs_conditional_delete_and_update_mor(spark, tmp_path):
    """The same clause shapes in merge-on-read: old row versions are
    deletion-vectored in place (no file rewrite) and only assigned
    versions append."""
    path = str(tmp_path / "nmbs_mor")
    t = _range_table(spark, path, n=100, files=4)
    before = {f.path for f in t.snapshot().files}
    src = spark.createDataFrame([(7, -1.0)], "id long, v double")
    t.merge(
        src,
        keys=["id"],
        mode="mor",
        not_matched_by_source="delete",
        not_matched_by_source_condition="t.id >= 95",
    )
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert len(rows) == 95 and rows[7] == -1.0 and 95 not in rows
    after = {f.path for f in t.snapshot().files}
    assert before <= after  # DV mode: no data file disappears

    t.merge(
        spark.createDataFrame([(8, -2.0)], "id long, v double"),
        keys=["id"],
        mode="mor",
        not_matched_by_source="update",
        not_matched_by_source_condition="t.id < 3",
        not_matched_by_source_assigns={"v": "t.v - 0.5"},
    )
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert rows[8] == -2.0
    assert rows[0] == -0.5 and rows[2] == 1.5  # v = id, assigned v - 0.5
    assert rows[3] == 3.0  # condition false: kept
    assert len(rows) == 95


def test_nmbs_sql_route(pond, spark):
    """SQL surface: `WHEN NOT MATCHED BY SOURCE AND <cond> THEN DELETE`
    and `... THEN UPDATE SET col = expr`; source references inside the
    by-source clause are rejected (no source row exists there)."""
    pond.sql(
        "CREATE TABLE lake.r9 AS "
        "SELECT id, CAST(id * 2 AS DOUBLE) AS v FROM range(20)"
    )
    pond.sql(
        "MERGE INTO lake.r9 AS tgt "
        "USING (SELECT 3 AS id, -3.0 AS v) AS s ON tgt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE AND tgt.id >= 18 THEN DELETE"
    )
    rows = {
        r["id"]: r["v"]
        for r in pond.sql("SELECT id, v FROM lake.r9").collect()
    }
    assert len(rows) == 18 and rows[3] == -3.0 and 18 not in rows

    pond.sql(
        "MERGE INTO lake.r9 AS tgt "
        "USING (SELECT 3 AS id, -4.0 AS v) AS s ON tgt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE AND tgt.id < 2 "
        "THEN UPDATE SET v = tgt.v + 100"
    )
    rows = {
        r["id"]: r["v"]
        for r in pond.sql("SELECT id, v FROM lake.r9").collect()
    }
    assert rows[3] == -4.0 and rows[0] == 100.0 and rows[1] == 102.0
    assert rows[2] == 4.0  # condition false: kept

    with pytest.raises(ValueError, match="cannot reference the source"):
        pond.sql(
            "MERGE INTO lake.r9 AS tgt "
            "USING (SELECT 3 AS id, 0.0 AS v) AS s ON tgt.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED BY SOURCE AND s.v > 0 THEN DELETE"
        )


def test_nmbs_cdf_frames(spark, tmp_path):
    """CDF rows for by-source actions: conditional delete records the
    dropped rows; by-source update records pre/postimages."""
    from athena_delta_lake_spark.delta.cdf import table_changes

    path = str(tmp_path / "nmbs_cdf")
    write_delta(
        spark.range(20).selectExpr("id", "id * 2.0 AS v").repartitionByRange(
            2, "id"
        ),
        path,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t = DeltaTable(spark, path)
    v0 = t.version()
    t.merge(
        spark.createDataFrame([(1, -1.0)], "id long, v double"),
        keys=["id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="t.id >= 18",
    )
    ch = table_changes(spark, path, v0 + 1).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], set()).add(r["id"])
    assert by_type["delete"] == {18, 19}
    assert by_type["update_preimage"] == {1}
    assert by_type["update_postimage"] == {1}

    v1 = t.version()
    t.merge(
        spark.createDataFrame([(2, -2.0)], "id long, v double"),
        keys=["id"],
        not_matched_by_source="update",
        not_matched_by_source_condition="t.id < 1",
        not_matched_by_source_assigns={"v": "t.v + 50"},
    )
    ch = [r for r in table_changes(spark, path, v1 + 1).collect()]
    pre = {r["id"]: r["v"] for r in ch if r["_change_type"] == "update_preimage"}
    post = {r["id"]: r["v"] for r in ch if r["_change_type"] == "update_postimage"}
    assert pre == {0: 0.0, 2: 4.0} and post == {0: 50.0, 2: -2.0}


def test_nmbs_validation_errors(spark, tmp_path):
    path = str(tmp_path / "nmbs_val")
    t = _range_table(spark, path, n=10, files=1)
    src = spark.createDataFrame([(1, 0.0)], "id long, v double")
    with pytest.raises(ValueError, match="per-column assignments"):
        t.merge(src, keys=["id"], not_matched_by_source="update")
    with pytest.raises(ValueError, match="only applies to 'update'"):
        t.merge(
            src, keys=["id"], not_matched_by_source="delete",
            not_matched_by_source_assigns={"v": "0.0"},
        )
    with pytest.raises(ValueError, match="need a"):
        t.merge(src, keys=["id"], not_matched_by_source_condition="t.id > 3")
    with pytest.raises(ValueError, match="'delete', 'update' or None"):
        t.merge(src, keys=["id"], not_matched_by_source="upsert")


# ----------------------------- light-planned MERGE (round-9 ask #1) ------


def _light_merge_table(spark, path: str):
    """checkpoint + tail-overlay table, the shape light planning replays."""
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    df = spark.range(1000).selectExpr("id", "id * 1.0 AS v").repartitionByRange(
        10, "id"
    )
    write_delta(df, path)
    write_checkpoint(path)
    write_delta(  # tail overlay commit
        spark.range(1000, 1100).selectExpr("id", "id * 1.0 AS v"), path
    )
    return DeltaTable(spark, path)


@pytest.fixture
def force_light(monkeypatch):
    from athena_delta_lake_spark.delta.log import DeltaLog

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    DeltaLog.clear_cache()
    yield
    DeltaLog.clear_cache()


def test_light_planned_merge_cow_matches_classic(spark, tmp_path, force_light):
    """MERGE candidate selection through the light plane: same results,
    same rewrite set as classic planning — and the result dict reports
    which plane planned it."""
    import os as _os

    pa = str(tmp_path / "lm_a")
    pb = str(tmp_path / "lm_b")
    ta = _light_merge_table(spark, pa)
    tb = _light_merge_table(spark, pb)
    src = spark.createDataFrame(
        [(250, -1.0), (251, -2.0), (5000, -3.0)], "id long, v double"
    )
    ra = ta.merge(src, keys=["id"])  # light (threshold forced to 1)
    assert ra["planning"] == "light", ra
    _os.environ["ADLS_LIGHT_PLANNING_FILES"] = "0"
    try:
        from athena_delta_lake_spark.delta.log import DeltaLog

        DeltaLog.clear_cache()
        rb = tb.merge(src, keys=["id"])
    finally:
        _os.environ["ADLS_LIGHT_PLANNING_FILES"] = "1"
    assert rb["planning"] == "classic", rb
    assert (ra["files_removed"], ra["files_added"]) == (
        rb["files_removed"],
        rb["files_added"],
    )
    rows_a = sorted((r["id"], r["v"]) for r in ta.to_df().collect())
    rows_b = sorted((r["id"], r["v"]) for r in tb.to_df().collect())
    assert rows_a == rows_b
    assert dict(rows_a)[250] == -1.0 and dict(rows_a)[5000] == -3.0
    assert len(rows_a) == 1101
    # the probe rewrote only the intersecting file(s), not the table
    assert ra["files_removed"] <= 2


def test_light_planned_merge_insert_only_and_mor(spark, tmp_path, force_light):
    path = str(tmp_path / "lm_io")
    t = _light_merge_table(spark, path)
    res = t.merge(
        spark.createDataFrame([(10, 0.0), (9999, 1.0)], "id long, v double"),
        keys=["id"],
        matched_clauses=[],  # insert-only fast path
    )
    assert res["planning"] == "light"
    assert t.count() == 1101  # 10 matched (no insert), 9999 inserted

    res = t.merge(
        spark.createDataFrame([(20, -5.0)], "id long, v double"),
        keys=["id"],
        mode="mor",
    )
    assert res["planning"] == "light"
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert rows[20] == -5.0 and len(rows) == 1101


def test_light_planned_merge_nmbs_wholesale_delete(spark, tmp_path, force_light):
    """Full-sync MERGE under light planning: the wholesale remove list
    streams from files_df (second metadata-only pass) — every unmatched
    row is gone, matched rows update, nothing lingers."""
    path = str(tmp_path / "lm_ws")
    t = _light_merge_table(spark, path)
    src = spark.createDataFrame(
        [(100, -1.0), (1050, -2.0), (7777, -3.0)], "id long, v double"
    )
    res = t.merge(src, keys=["id"], not_matched_by_source="delete")
    assert res["planning"] == "light"
    rows = sorted((r["id"], r["v"]) for r in t.to_df().collect())
    assert rows == [(100, -1.0), (1050, -2.0), (7777, -3.0)]


def test_light_planned_merge_fallbacks(spark, tmp_path, force_light):
    """Classic fallback when the light plane cannot bound the work:
    unconditional by-source UPDATE, unparseable by-source condition."""
    path = str(tmp_path / "lm_fb")
    t = _light_merge_table(spark, path)
    src = spark.createDataFrame([(1, -1.0)], "id long, v double")
    res = t.merge(
        src,
        keys=["id"],
        not_matched_by_source="update",
        not_matched_by_source_assigns={"v": "t.v + 1"},
    )
    assert res["planning"] == "classic"
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert rows[1] == -1.0 and rows[2] == 3.0 and rows[1099] == 1100.0

    res = t.merge(
        src,
        keys=["id"],
        not_matched_by_source="delete",
        # OR parses no conjunct -> reach unbounded -> classic
        not_matched_by_source_condition="t.id >= 1098 OR t.v > 1e12",
    )
    assert res["planning"] == "classic"
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert len(rows) == 1098 and 1097 in rows and 1098 not in rows

    # conditional by-source delete WITH a parseable bound stays light
    res = t.merge(
        src,
        keys=["id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="t.id >= 1090",
    )
    assert res["planning"] == "light"
    assert t.count() == 1090 + 0  # ids 0..1089 (1 matched), >=1090 gone


def test_backlog_warning_suppressed_on_committed_restart(spark, tmp_path):
    """A checkpoint restart whose last batch fully committed before
    shutdown replays nothing — the engine's FIRST call on the new reader
    is latestOffset(). That call must neither warn nor pay the
    O(threshold) backlog probe (round-8 ADVICE: the _floor_version
    fallback did both, on every such restart)."""
    import warnings as _w

    from athena_delta_lake_spark.sources.deltapond_source import (
        DeltaPondStreamReader,
    )

    src = str(tmp_path / "restart")
    write_delta(spark.range(40).selectExpr("id").repartition(8), src)
    write_delta(spark.range(40, 80).selectExpr("id").repartition(8), src)
    snap = DeltaTable(spark, src).snapshot()

    os.environ["ADLS_STREAM_BACKLOG_WARN_FILES"] = "5"
    try:
        # committed restart: no initialOffset(), no recovery replay
        r = DeltaPondStreamReader(
            {"path": src, "startingVersion": "0"}, snap.schema
        )
        probes = []
        orig = r._commit_admission

        def spy(log, v):
            probes.append(v)
            return orig(log, v)

        r._commit_admission = spy
        with _w.catch_warnings():
            _w.simplefilter("error")
            assert r.latestOffset() == {"version": 1}
        assert probes == []  # the probe itself is skipped, not just muted

        # the suppression must NOT consume the one-shot: after a real
        # fresh initialization in the same process the warning still fires
        r.initialOffset()
        with pytest.warns(UserWarning, match="drain_backlog"):
            r.latestOffset()
    finally:
        os.environ.pop("ADLS_STREAM_BACKLOG_WARN_FILES", None)


# ---------------- round-9 second review pass: tz parsing, derivation
# wall-clock domain, NTZ literals, staged-checkpoint re-run, .tmp sweep


def test_parse_tz_name_offset_forms():
    """Spark accepts offset-form zone ids ZoneInfo cannot parse; a silent
    UTC fallback shifted every naive timestamp predicate by the offset."""
    import datetime

    from athena_delta_lake_spark.delta.stats import parse_tz_name

    assert parse_tz_name("GMT+08:00").utcoffset(None) == datetime.timedelta(
        hours=8
    )
    assert parse_tz_name("UTC+05:30").utcoffset(None) == datetime.timedelta(
        hours=5, minutes=30
    )
    assert parse_tz_name("-0330").utcoffset(None) == -datetime.timedelta(
        hours=3, minutes=30
    )
    assert parse_tz_name("GMT").utcoffset(None) == datetime.timedelta(0)
    assert parse_tz_name("America/New_York") is not None
    # java.time.ZoneId.SHORT_IDS — Spark-legal, ZoneInfo-unparseable
    assert str(parse_tz_name("JST")) == "Asia/Tokyo"
    assert str(parse_tz_name("PST")) == "America/Los_Angeles"
    assert parse_tz_name("EST").utcoffset(None) == -datetime.timedelta(
        hours=5
    )
    assert parse_tz_name("UT+08:00").utcoffset(None) == datetime.timedelta(
        hours=8
    )
    with pytest.raises(ValueError):
        parse_tz_name("Not/AZone")
    # malformed offsets RAISE instead of parsing to a silently-wrong zone
    with pytest.raises(ValueError):
        parse_tz_name("+05300")
    with pytest.raises(ValueError):
        parse_tz_name("GMT+8:75")


def test_prune_equality_offset_form_session_tz(spark, tmp_path):
    """Evaluator equality under an offset-form session zone (the exact
    case the old ZoneInfo-or-UTC fallback got wrong driver-side)."""
    import datetime

    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.stats import (
        prune_files,
        prune_files_distributed,
    )

    path = str(tmp_path / "offtz")
    df = spark.range(96).selectExpr(
        "timestamp'2024-05-01 00:00:00' + "
        "make_interval(0,0,0,0,0,0,id*3600) AS ts",
        "id AS v",
    ).repartitionByRange(4, "ts")
    write_delta(df, path)
    snap = DeltaLog(path).snapshot()
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "GMT+08:00")
    try:
        for preds in (
            [("ts", "<", "2024-05-02 00:00:00")],
            [("ts", ">=", datetime.datetime(2024, 5, 3, 12, 0))],
        ):
            py = [f.path for f in prune_files(snap, preds)]
            dist = [
                f.path for f in prune_files_distributed(spark, snap, preds)
            ]
            assert dist == py, preds
            # and the evaluators agree with the ROW answer
            t = DeltaTable(spark, path)
            col, op, val = preds[0]
            expr = {"<": "<", ">=": ">="}[op]
            lit = (
                f"timestamp'{val}'"
                if isinstance(val, str)
                else f"timestamp'{val.isoformat(sep=' ')}'"
            )
            want = t.to_df().filter(f"ts {expr} {lit}").count()
            got = t.to_df(where=preds).count()
            assert got == want, preds
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_generated_derivation_uses_session_wall_clock(spark, tmp_path):
    """An AWARE bound (merge key ranges are aware-UTC now) on a
    CAST(ts AS DATE)-partitioned table must derive the SESSION-local
    date: under America/Los_Angeles an instant at 01:00Z lives in the
    PREVIOUS session day's partition."""
    import datetime

    import pyspark.sql.types as T

    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.stats import prune_files

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        path = str(tmp_path / "genwall")
        schema = T.StructType(
            [
                T.StructField("ts", T.TimestampType()),
                T.StructField("v", T.LongType()),
                T.StructField(
                    "d",
                    T.DateType(),
                    metadata={
                        "delta.generationExpression": "CAST(ts AS DATE)"
                    },
                ),
            ]
        )
        base = spark.createDataFrame(
            [(f"2024-03-0{d} 10:00:00", d) for d in range(1, 4)],
            "ts string, v long",
        ).select(F.to_timestamp("ts").alias("ts"), "v")
        df = base.withColumn("d", F.to_date("ts"))
        write_delta(
            spark.createDataFrame(df.collect(), schema),
            path,
            partition_by=["d"],
        )
        snap = DeltaLog(path).snapshot()
        days = sorted(f.partition_values["d"] for f in snap.files)
        assert days == ["2024-03-01", "2024-03-02", "2024-03-03"]
        # the instant of the 03-02 10:00 LA row, as aware UTC (18:00Z)
        inst = datetime.datetime(
            2024, 3, 2, 18, 0, tzinfo=datetime.timezone.utc
        )
        pruned = prune_files(snap, [("ts", "=", inst)])
        assert [f.partition_values["d"] for f in pruned] == ["2024-03-02"]
        # an aware instant that is ALREADY the next UTC day (03-03 01:00Z
        # == 03-02 17:00 LA) must DERIVE the session-local date 03-02 —
        # the old UTC-calendar derivation produced d=2024-03-03 and would
        # prune the partition holding any matching row
        from athena_delta_lake_spark.delta.stats import (
            _derive_generated_preds,
        )

        inst2 = datetime.datetime(
            2024, 3, 3, 1, 0, tzinfo=datetime.timezone.utc
        )
        derived = _derive_generated_preds(snap, [("ts", "=", inst2)])
        assert derived == [("d", "=", datetime.date(2024, 3, 2))], derived
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_ntz_predicates_os_independent_and_aware_rejected(spark, tmp_path):
    """TIMESTAMP_NTZ predicates: naive values render as zone-free string
    casts in every evaluator (F.lit(naive) would ride the driver OS
    zone); aware values are rejected up front in all paths."""
    import datetime

    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.stats import (
        prune_files,
        prune_files_distributed,
    )

    path = str(tmp_path / "ntzp")
    df = spark.range(48).selectExpr(
        "timestamp_ntz'2024-04-01 00:00:00' + "
        "make_interval(0,0,0,0,0,0,id*3600) AS tn",
        "id AS v",
    ).repartitionByRange(4, "tn")
    write_delta(df, path)
    snap = DeltaLog(path).snapshot()
    preds = [("tn", ">=", datetime.datetime(2024, 4, 1, 12, 0))]
    py = [f.path for f in prune_files(snap, preds)]
    dist = [f.path for f in prune_files_distributed(spark, snap, preds)]
    assert dist == py
    t = DeltaTable(spark, path)
    assert (
        t.to_df(where=preds).count()
        == t.to_df().filter("tn >= timestamp_ntz'2024-04-01 12:00:00'").count()
    )
    aware = [
        ("tn", ">=", datetime.datetime(2024, 4, 1, tzinfo=datetime.timezone.utc))
    ]
    with pytest.raises(ValueError, match="TIMESTAMP_NTZ"):
        prune_files(snap, aware)
    with pytest.raises(ValueError, match="TIMESTAMP_NTZ"):
        t.to_df(where=aware).count()


def test_staged_checkpoint_rerun_overwrites(spark, tmp_path, monkeypatch):
    """Re-running the staged (remote-scheme) checkpoint at the SAME
    version must overwrite like the posix path's os.replace — Hadoop
    rename refuses an existing destination — and never leak the stage
    dir, even across repeats."""
    from athena_delta_lake_spark.delta import fs as fsmod
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "rerun")
    write_delta(
        spark.range(300).selectExpr("id", "cast(id % 6 as int) as p"),
        path,
        partition_by=["p"],
    )
    write_checkpoint(path)
    write_delta(
        spark.range(5).selectExpr("id + 1000 as id", "cast(0 as int) as p"),
        path,
        mode="append",
    )
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "5")
    monkeypatch.setattr(fsmod, "executor_fs_safe", lambda p: False)
    v1 = write_checkpoint(path, parts=2, spark=spark)
    v2 = write_checkpoint(path, parts=2, spark=spark)  # same version again
    assert v1 == v2
    DeltaLog.clear_cache()
    snap = DeltaLog(path).snapshot()
    assert snap.num_files == len(snap.files)
    assert DeltaTable(spark, path).to_df().count() == 305
    tmp_dir = os.path.join(path, "_delta_log", ".tmp")
    assert not os.path.exists(tmp_dir) or not os.listdir(tmp_dir)


def test_vacuum_sweeps_stale_delta_log_tmp(spark, tmp_path):
    """Crashed staging attempts leave parts under _delta_log/.tmp that no
    other path cleans; VACUUM sweeps them once expired (classic + light,
    any extension), while fresh scratch survives the retention window."""
    from athena_delta_lake_spark.delta import dml
    from athena_delta_lake_spark.delta.log import DeltaLog

    import shutil
    import time as _time

    a = str(tmp_path / "tmpsweep")
    write_delta(
        spark.range(60).selectExpr("id", "cast(id % 3 as int) as p"),
        a,
        partition_by=["p"],
    )
    stale = os.path.join(a, "_delta_log", ".tmp", "checkpoint-dead")
    os.makedirs(stale)
    for n in ("part-0.parquet", "_SUCCESS", "leftover.jsonl"):
        with open(os.path.join(stale, n), "w") as f:
            f.write("x")
    old = _time.time() - 10 * 24 * 3600
    for n in os.listdir(stale):
        os.utime(os.path.join(stale, n), (old, old))

    res = dml.vacuum(a, retention_hours=168, dry_run=True)
    got = {r for r in res["files"] if r.startswith("_delta_log/.tmp/")}
    assert got == {
        "_delta_log/.tmp/checkpoint-dead/part-0.parquet",
        "_delta_log/.tmp/checkpoint-dead/_SUCCESS",
        "_delta_log/.tmp/checkpoint-dead/leftover.jsonl",
    }
    # light path proposes the same sweep
    b = str(tmp_path / "tmpsweep_b")
    shutil.copytree(a, b)
    for n in os.listdir(os.path.join(b, "_delta_log", ".tmp", "checkpoint-dead")):
        p = os.path.join(b, "_delta_log", ".tmp", "checkpoint-dead", n)
        os.utime(p, (old, old))
    DeltaLog.clear_cache()
    os.environ["ADLS_LIGHT_PLANNING_FILES"] = "5"
    try:
        from athena_delta_lake_spark.delta.writer import write_checkpoint

        write_checkpoint(b)
        DeltaLog.clear_cache()
        res_l = dml.vacuum(b, retention_hours=168, spark=spark)
        assert res_l["planning"] == "light"
        assert not os.path.exists(
            os.path.join(b, "_delta_log", ".tmp", "checkpoint-dead")
        ) or not os.listdir(
            os.path.join(b, "_delta_log", ".tmp", "checkpoint-dead")
        )
        # the table itself is intact
        assert DeltaTable(spark, b).to_df().count() == 60
    finally:
        del os.environ["ADLS_LIGHT_PLANNING_FILES"]
        DeltaLog.clear_cache()
