"""Round-7 defect regressions (ADVICE.md round 6):

1. ANALYZE TABLE's live-bytes fraction must come from a COMPLETE per-file
   numRecords pass: on an early break (a file lacking stats) the partial
   total applied to the full physical size could drastically understate
   liveBytes and mis-fire the broadcast hint — fall back to physical size;
2. ANALYZE FOR COLUMNS partition min/max: a DV-carrying file with no
   numRecords stat is unprovable either way (its partition value may have
   zero live rows) — route the column through the scan fallback instead of
   trusting the log-derived extreme;
3. _fast_num_records's single-occurrence regex must also verify the match
   is TOP-LEVEL: stats with no real numRecords but a data column literally
   named numRecords in exactly one nested section must not surface that
   column's stat as the file row count;
4. streaming admission under skipChangeCommits: commits that partitions()
   skips wholesale (they carry dataChange removes) are admitted zero-cost
   by latestOffset, so a trigger's file/byte budget is never burned on
   rows that are never emitted.
"""

from __future__ import annotations

import json
import os

import pytest

from athena_delta_lake_spark import write_delta
from athena_delta_lake_spark.catalog import DeltaPond
from athena_delta_lake_spark.delta import DeltaLog
from athena_delta_lake_spark.delta.log import AddFile, _fast_num_records
from athena_delta_lake_spark.delta.table import DeltaTable


@pytest.fixture
def pond(spark, tmp_path):
    p = DeltaPond(spark, str(tmp_path / "pond"))
    p.sql("CREATE SCHEMA lake")
    return p


def _append_commit(path: str, actions: list[dict]) -> None:
    log_dir = os.path.join(path, "_delta_log")
    v = DeltaLog(path).latest_version() + 1
    with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    DeltaLog.clear_cache()


# ---------------- 1. partial numRecords pass never scales physical size


def test_analyze_live_bytes_falls_back_on_partial_counts(spark, pond):
    """A DV'd file counted BEFORE the loop breaks on a stats-less file
    must not scale the FULL physical size by a partial live fraction:
    liveBytes falls back to sizeInBytes."""
    from athena_delta_lake_spark.sqldml import _target

    pond.sql("CREATE TABLE lake.partial (id BIGINT) USING delta")
    path = _target(pond, ["lake", "partial"])
    pond.sql("INSERT INTO lake.partial VALUES (1), (2), (3), (4)")
    snap = DeltaLog(path).snapshot()
    f0 = snap.files[0]
    # re-add the SAME file first with a DV descriptor claiming 3 of its
    # rows dead (cardinality only — the analyze NOSCAN path reads just
    # the log), then a second add that has NO stats: the per-file loop
    # counts f0 (total=4, dv=3) and then breaks.
    from athena_delta_lake_spark.delta.deletion_vectors import write_dv_file

    desc = write_dv_file(path, [0, 1, 2])
    _append_commit(
        path,
        [
            {"commitInfo": {"timestamp": 1, "operation": "TEST"}},
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            {
                "add": {
                    "path": f0.path,
                    "partitionValues": {},
                    "size": f0.size,
                    "modificationTime": 1,
                    "dataChange": False,
                    "stats": f0.stats_json(),
                    "deletionVector": desc,
                }
            },
            {
                "add": {
                    "path": "zzz-no-stats.parquet",
                    "partitionValues": {},
                    "size": 10_000_000,
                    "modificationTime": 1,
                    "dataChange": False,
                }
            },
        ],
    )
    pond.sql("ANALYZE TABLE lake.partial COMPUTE STATISTICS NOSCAN")
    props = {
        r["key"]: r["value"]
        for r in pond.sql("SHOW TBLPROPERTIES lake.partial").collect()
    }
    # partial fraction would have been (4-3)/4 = 0.25 of the physical
    # size; the complete-pass guard keeps liveBytes == sizeInBytes
    assert props["pond.stats.liveBytes"] == props["pond.stats.sizeInBytes"]
    assert "pond.stats.numRows" not in props  # NOSCAN + missing stats


# ------- 2. unprovable DV'd file routes partition min/max through the scan


def test_analyze_columns_partition_minmax_scans_when_dv_unprovable(
    spark, pond
):
    """A file whose every row is DV-deleted but whose add action carries
    NO numRecords stat must not contribute its partition value as the
    column max — the scan fallback (DV anti-join applied) owns the
    answer."""
    from athena_delta_lake_spark.delta.deletion_vectors import write_dv_file
    from athena_delta_lake_spark.sqldml import _target

    pond.sql(
        "CREATE TABLE lake.pm (id BIGINT, p INT) USING delta "
        "PARTITIONED BY (p)"
    )
    path = _target(pond, ["lake", "pm"])
    df = spark.createDataFrame(
        [(i, pp) for pp in (1, 2) for i in range(100)], "id long, p int"
    ).coalesce(1)
    write_delta(df, path, mode="append")
    snap = DeltaLog(path).snapshot()
    p2_files = [
        f for f in snap.files if f.partition_values.get("p") == "2"
    ]
    assert len(p2_files) == 1  # the DV below must cover the whole partition
    f2 = p2_files[0]
    # a real DV covering every row of the p=2 file, re-added WITHOUT stats
    desc = write_dv_file(path, list(range(100)))
    _append_commit(
        path,
        [
            {"commitInfo": {"timestamp": 1, "operation": "TEST"}},
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            {
                "add": {
                    "path": f2.path,
                    "partitionValues": {"p": "2"},
                    "size": f2.size,
                    "modificationTime": 1,
                    "dataChange": False,
                    "deletionVector": desc,
                }
            },
        ],
    )
    assert DeltaTable(spark, path).to_df().filter("p = 2").count() == 0
    rows = {
        r["col_name"]: r
        for r in pond.sql(
            "ANALYZE TABLE lake.pm COMPUTE STATISTICS FOR COLUMNS p"
        ).collect()
    }
    # p=2 has zero live rows: the scan-derived extreme is 1, not 2
    assert rows["p"]["min"] == "1"
    assert rows["p"]["max"] == "1"


# --------------------- 3. _fast_num_records ignores nested-only occurrences


def _add(stats_raw):
    return AddFile(
        path="x.parquet",
        partition_values={},
        size=1,
        modification_time=0,
        stats_raw=stats_raw,
    )


def test_fast_num_records_top_level_only():
    # the real thing: top-level numRecords, nested sections present
    assert (
        _fast_num_records(
            _add('{"numRecords":5,"minValues":{"a":1},"maxValues":{"a":9}}')
        )
        == 5
    )
    # a data column literally named numRecords in exactly ONE nested
    # section and NO top-level key: must NOT return 3
    assert (
        _fast_num_records(_add('{"nullCount":{"numRecords":3}}')) is None
    )
    # both present: two occurrences -> full parse -> top-level wins
    assert (
        _fast_num_records(
            _add('{"numRecords":7,"nullCount":{"numRecords":3}}')
        )
        == 7
    )
    # whitespace before the top-level key is still top-level
    assert _fast_num_records(_add('{ "numRecords" : 11 }')) == 11
    assert _fast_num_records(_add(None)) is None


# ------------- 4. skipChangeCommits commits admitted zero-cost by the caps


def test_skip_change_commits_does_not_burn_admission_budget(spark, tmp_path):
    """v1 is a rewrite commit (removes + many adds) that skipChangeCommits
    drops wholesale; under maxFilesPerTrigger the trigger that crosses it
    must still fill its budget from the NEXT commit instead of burning it
    on never-emitted files."""
    from athena_delta_lake_spark.sources.deltapond_source import (
        DeltaPondStreamReader,
    )

    src = str(tmp_path / "src")
    write_delta(spark.range(20).selectExpr("id").repartition(2), src)  # v0
    # v1: rewrite (remove + re-add) -> 6 add files + removes
    t = DeltaTable(spark, src)
    t.update(set={"id": "id"}, where="id >= 0", mode="cow")  # full rewrite
    # confirm v1 really carries dataChange removes and adds
    acts = DeltaLog(src).commit_actions(1)
    assert any(
        "remove" in a and a["remove"].get("dataChange", True) for a in acts
    )
    write_delta(spark.range(100, 120).selectExpr("id").repartition(2), src)  # v2

    snap = t.snapshot()
    r = DeltaPondStreamReader(
        {
            "path": src,
            "startingVersion": "0",
            "skipChangeCommits": "true",
            "maxFilesPerTrigger": "2",
        },
        snap.schema,
    )
    assert r.initialOffset() == {"version": -1}
    off1 = r.latestOffset()
    assert off1 == {"version": 0}, off1  # v0's 2 files fill the budget
    assert len(r.partitions({"version": -1}, off1)) == 2
    r.commit(off1)
    # next trigger: v1 is skipped ZERO-COST, budget lands on v2's files
    off2 = r.latestOffset()
    parts2 = r.partitions(off1, off2)
    assert len(parts2) == 2, (off2, len(parts2))
    assert all("src" in p.file_path for p in parts2)
    r.commit(off2)
    # drained
    off3 = r.latestOffset()
    assert r.partitions(off2, off3) == []
