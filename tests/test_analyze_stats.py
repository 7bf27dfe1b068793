"""ANALYZE TABLE … COMPUTE STATISTICS + stats-driven broadcast planning
(round-6 ask #6): pond tables bind as temp views with no catalog stats,
and Catalyst's size estimate degrades to unknown/huge on exactly the
scans that most deserve broadcasting (DV anti-joins) — so multi-join
pond.sql queries relied on AQE alone. The ANALYZE route stores
rowCount/sizeInBytes from the LOG (zero scan) and binding applies a
broadcast hint when the current snapshot fits under
spark.sql.autoBroadcastJoinThreshold."""

import os

import pytest

from athena_delta_lake_spark import write_delta
from athena_delta_lake_spark.catalog import DeltaPond, _parse_byte_conf


@pytest.fixture()
def pond(spark, tmp_path):
    root = str(tmp_path / "pond")
    fact = spark.range(200000).selectExpr(
        "id", "cast(id % 40 as long) as dim_id", "cast(id as double) as v",
        "sha2(cast(id as string), 256) as pad",
    )
    # MOR-shrunk dim: 50k physical rows with random-ish payload (parquet
    # bytes well above the test's broadcast threshold), then a
    # merge-on-read DELETE that deletion-vectors all but 40 rows — the
    # files keep their size, so Catalyst's estimate stays big while the
    # log knows the live table is tiny
    dim = spark.range(50000).selectExpr(
        "id as dim_id",
        "concat('name_', id) as name",
        "sha2(cast(id as string), 256) as pad1",
        "sha2(cast(id + 1 as string), 256) as pad2",
    )
    write_delta(fact, f"{root}/lake/fact")
    write_delta(dim.coalesce(2), f"{root}/lake/dim")
    from athena_delta_lake_spark.delta.dml import delete_mor

    delete_mor(spark, f"{root}/lake/dim", "dim_id >= 40")
    return DeltaPond(spark, root)


JOIN_SQL = """
    SELECT d.name, count(*) AS n, sum(f.v) AS sv
    FROM lake.fact f JOIN lake.dim d ON f.dim_id = d.dim_id
    GROUP BY d.name
"""


def _plan(pond, sql):
    return pond.sql(sql)._jdf.queryExecution().executedPlan().toString()


def test_analyze_computes_log_stats(spark, pond):
    row = pond.sql("ANALYZE TABLE lake.dim COMPUTE STATISTICS").first()
    assert row["operation"] == "analyze_table"
    assert row["numRows"] == 40  # 50k minus the DV'd rows, no scan needed
    assert int(row["sizeInBytes"]) > 0
    props = {
        r["key"]: r["value"]
        for r in pond.sql("SHOW TBLPROPERTIES lake.dim").collect()
    }
    assert props["pond.stats.numRows"] == "40"
    assert int(props["pond.stats.sizeInBytes"]) > 0
    assert "pond.stats.analyzedVersion" in props


def test_join_flips_to_broadcast_without_aqe(spark, pond):
    """The dimension-fact join must plan a BroadcastHashJoin after
    ANALYZE, with AQE disabled — deterministic planning, not a runtime
    rescue. The threshold sits between the dim's PHYSICAL bytes (what
    Catalyst estimates from) and its LIVE bytes (what the log knows
    after the MOR delete), so only the stats-driven hint can flip it."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    import os as _os

    def phys(tbl):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in _os.walk(pond.root + "/lake/" + tbl)
            for f in fs
            if f.endswith(".parquet")
        )

    thr = 100 * 1024
    # premise: both sides' PHYSICAL bytes exceed the threshold, only the
    # dim's LIVE bytes (40 of 50k rows) are under it
    assert phys("dim") > thr and phys("fact") > thr
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))
    try:
        before = _plan(pond, JOIN_SQL)
        assert "BroadcastHashJoin" not in before, (
            "premise broken: Catalyst broadcast the un-analyzed MOR dim "
            "despite physical bytes above the threshold"
        )
        pond.sql("ANALYZE TABLE lake.dim COMPUTE STATISTICS")
        after = _plan(pond, JOIN_SQL)
        assert "BroadcastHashJoin" in after, after
        # and the result is unchanged by the hint
        got = {r["name"]: r["n"] for r in pond.sql(JOIN_SQL).collect()}
        assert len(got) == 40 and got["name_0"] == 5000
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_hint_respects_disabled_broadcast(spark, pond):
    pond.sql("ANALYZE TABLE lake.dim COMPUTE STATISTICS")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert "BroadcastHashJoin" not in _plan(pond, JOIN_SQL)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_parse_byte_conf():
    assert _parse_byte_conf("10485760") == 10 * 1024 * 1024
    assert _parse_byte_conf("10m") == 10 * 1024 * 1024
    assert _parse_byte_conf("10MB") == 10 * 1024 * 1024
    assert _parse_byte_conf("1g") == 1 << 30
    assert _parse_byte_conf("512b") == 512
    assert _parse_byte_conf("-1") == -1


def test_analyze_for_columns_metadata_path(spark, tmp_path):
    """FOR COLUMNS derives min/max/nullCount from log stats (no DVs) and
    ndv from one pruned scan; properties land as pond.stats.col.*."""
    import json

    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta import DeltaLog

    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(100).selectExpr(
            "id",
            "CAST(id % 7 AS INT) AS k",
            "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('s', id) END AS s",
        ),
        path,
        partition_by=["k"],
    )
    pond = DeltaPond(spark, root)
    rows = {
        r["col_name"]: r
        for r in pond.sql(
            "ANALYZE TABLE lake.t COMPUTE STATISTICS FOR COLUMNS id, k, s"
        ).collect()
    }
    assert rows["id"]["min"] == "0" and rows["id"]["max"] == "99"
    assert rows["id"]["null_count"] == 0
    assert rows["id"]["distinct_count"] >= 95  # approx ndv of 100
    assert rows["k"]["min"] == "0" and rows["k"]["max"] == "6"
    assert rows["k"]["distinct_count"] == 7
    assert rows["s"]["null_count"] == 10  # string: via the scan path
    cfg = DeltaLog(path).snapshot().metadata["configuration"]
    st = json.loads(cfg["pond.stats.col.id"])
    assert st["min"] == 0 and st["max"] == 99 and st["nullCount"] == 0


def test_analyze_for_all_columns_and_noscan_conflict(spark, tmp_path):
    import pytest

    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.dml import delete_mor

    root = str(tmp_path / "pond")
    path = f"{root}/lake/t"
    write_delta(spark.range(50).selectExpr("id", "id % 3 AS k"), path)
    delete_mor(spark, path, "id >= 40")  # DVs: min/max must NOT trust stats
    pond = DeltaPond(spark, root)
    rows = {
        r["col_name"]: r
        for r in pond.sql(
            "ANALYZE TABLE lake.t COMPUTE STATISTICS FOR ALL COLUMNS"
        ).collect()
    }
    assert rows["id"]["max"] == "39"  # scan path sees through the DV
    assert rows["k"]["max"] == "2"
    with pytest.raises(ValueError, match="NOSCAN"):
        pond.sql(
            "ANALYZE TABLE lake.t COMPUTE STATISTICS NOSCAN FOR COLUMNS id"
        )
    with pytest.raises(ValueError, match="no such column"):
        pond.sql("ANALYZE TABLE lake.t COMPUTE STATISTICS FOR COLUMNS nope")


def test_analyze_for_columns_stays_light_and_equals_classic(
    spark, tmp_path, monkeypatch
):
    """Past the threshold the per-file stats fold runs executor-side
    (_fold_log_stats_light) and the ndv/fallback scan reads through the
    auto-light table route — with DeltaLog.snapshot poisoned the
    reported stats must be IDENTICAL to the classic fold, across
    partition extremes, DV-carrying files, a null-partition value, and
    string/timestamp scan fallbacks."""
    from athena_delta_lake_spark import DeltaTable, write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    root = str(tmp_path / "pond_l")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(200).selectExpr(
            "id",
            "CAST(CASE WHEN id % 11 = 3 THEN NULL ELSE id % 5 END AS INT) AS k",
            "CAST(id AS DOUBLE) / 7 AS v",
            "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('s', id) END AS s",
            "timestamp_seconds(1700000000 + id * 60) AS ts",
        ),
        path,
        partition_by=["k"],
    )
    DeltaTable(spark, path).delete(where="id % 13 = 0", mode="mor")  # DVs
    pond = DeltaPond(spark, root)
    stmt = "ANALYZE TABLE lake.t COMPUTE STATISTICS FOR ALL COLUMNS"
    want = sorted(tuple(r) for r in pond.sql(stmt).collect())
    cfg_classic = {
        k: v
        for k, v in DeltaLog(path)
        .snapshot()
        .metadata["configuration"]
        .items()
        if k.startswith("pond.stats.col.")
    }

    write_checkpoint(path)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append((self.table_path, version))
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    got = sorted(tuple(r) for r in pond.sql(stmt).collect())
    assert calls == [], f"classic snapshot replayed: {calls}"
    monkeypatch.setattr(DeltaLog, "snapshot", orig)
    monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES")
    DeltaLog.clear_cache()
    assert got == want
    cfg_light = {
        k: v
        for k, v in DeltaLog(path)
        .snapshot()
        .metadata["configuration"]
        .items()
        if k.startswith("pond.stats.col.")
    }
    assert cfg_light == cfg_classic


def test_analyze_for_columns_light_provable_fold(spark, tmp_path, monkeypatch):
    """No DVs: numeric/date columns take the PROVABLE executor-side fold
    (min/max/nullCount straight from the log stats, no data scan for
    them) and must match the classic driver fold exactly."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    root = str(tmp_path / "pond_pf")
    path = f"{root}/lake/t"
    write_delta(
        spark.range(300).selectExpr(
            "id",
            "CAST(id % 4 AS INT) AS k",
            "CASE WHEN id % 9 = 0 THEN NULL ELSE CAST(id AS DOUBLE) / 3 END AS v",
            "date_add(DATE'2024-01-01', CAST(id % 30 AS INT)) AS d",
            "timestamp_seconds(1700000000 + id) AS ts",
        ),
        path,
        partition_by=["k"],
    )
    pond = DeltaPond(spark, root)
    # ts is DV-free and stats-provable, but timestamps route through the
    # scan on BOTH planes (zone-coherence) — included to pin that parity
    stmt = (
        "ANALYZE TABLE lake.t COMPUTE STATISTICS FOR COLUMNS id, k, v, d, ts"
    )
    want = sorted(tuple(r) for r in pond.sql(stmt).collect())

    write_checkpoint(path)
    DeltaLog.clear_cache()
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    calls = []
    orig = DeltaLog.snapshot

    def poisoned(self, version=None):
        calls.append((self.table_path, version))
        return orig(self, version)

    monkeypatch.setattr(DeltaLog, "snapshot", poisoned)
    got = sorted(tuple(r) for r in pond.sql(stmt).collect())
    assert calls == [], f"classic snapshot replayed: {calls}"
    monkeypatch.setattr(DeltaLog, "snapshot", orig)
    assert got == want
    by_col = {r[0]: r for r in got}
    assert by_col["v"][3] == 34  # nullCount folded from log stats (300/9+1)
    assert by_col["d"][1] == "2024-01-01" and by_col["d"][2] == "2024-01-30"
