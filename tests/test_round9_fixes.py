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

from athena_delta_lake_spark import DeltaTable, write_delta


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
