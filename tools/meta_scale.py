"""Metadata-plane scale measurement: log replay, pruning, and checkpoint
I/O at 10^5–10^6 add actions (round-6 ask #1).

Synthesizes a Delta log DIRECTLY as JSON (no data files — metadata-plane
only), then measures wall time + driver RSS for:

  1. cold replay from commit JSONs           (DeltaLog.snapshot)
  2. checkpoint write                        (write_checkpoint, multi-part)
  3. cold replay from the checkpoint
  4. driver-side Python prune                (stats.prune_files)
  5. distributed Spark prune                 (stats.prune_files_distributed)
  6. files_df build + count                  (SnapshotState.files_df)

and asserts the two prune paths return identical file lists. The
reference's one known scalability bug was exactly metadata-plane
(O(partitions x files) split generation, DeltaMetadataHandler.scala:
159-182); this proves the rebuild's driver has measured, bounded
behavior at the 100 TB file-count regime instead of asserting it.

Usage: python tools/meta_scale.py [n_files] [adds_per_commit]
       python tools/meta_scale.py [n_files] [adds_per_commit] --light
       python tools/meta_scale.py [n_files] [adds_per_commit] --plan [--check-classic]
Prints one JSON line with the measurements (recorded in PERF_TRIAGE_r6).

--light (round-7 ask #6): measure the DRIVER-LIGHT snapshot path
(DeltaLog.snapshot_light + LightSnapshot.files_df/prune_df) in a FRESH
process against a table prepared by a prior normal run — peak RSS then
reflects only the light path, which holds no AddFiles: O(header + tail)
driver memory at ANY file count. The classic path measured 8.6 GiB RSS
at 10^7 adds; the light path's bar is < 2 GiB.

--plan (round-8 ask #3): measure the AUTO-ROUTED light planning wiring in
a fresh process — ordinary DeltaTable.to_df predicate planning
(_planning_snapshot) and a partition-predicate DELETE, both served by
collect_pruned_add_files past the ADLS_LIGHT_PLANNING_FILES threshold —
asserting driver RSS stays under 2 GiB at any file count. The DELETE's
commit is removed afterwards so the prepared table stays reusable.
--check-classic additionally loads the CLASSIC snapshot (expensive:
~270 s / 8.6 GiB at 10^7) and asserts the light survivors are identical;
run it at 10^6 where the classic path is cheap.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "day", "type": "date", "nullable": True, "metadata": {}},
        ],
    }
)


def rss_mib() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def build_log(root: str, n_files: int, per_commit: int) -> str:
    """Write a synthetic partitioned log: n_files adds across
    ceil(n/per_commit) commits, hive layout day=YYYY-MM-DD, per-file
    min/max stats on id and v."""
    import datetime

    path = os.path.join(root, "meta_scale_tbl")
    shutil.rmtree(path, ignore_errors=True)
    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)
    base_day = datetime.date(2024, 1, 1)
    rows_per_file = 100_000
    fidx = 0
    version = 0
    while fidx < n_files:
        actions = []
        if version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(
                {
                    "metaData": {
                        "id": "meta-scale",
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": SCHEMA_STR,
                        "partitionColumns": ["day"],
                        "configuration": {},
                    }
                }
            )
        count = min(per_commit, n_files - fidx)
        lines = []
        for _ in range(count):
            day = base_day + datetime.timedelta(days=fidx % 365)
            lo = fidx * rows_per_file
            hi = lo + rows_per_file - 1
            lines.append(
                {
                    "add": {
                        "path": f"day={day.isoformat()}/part-{fidx:07d}.parquet",
                        "partitionValues": {"day": day.isoformat()},
                        "size": 128 * 1024 * 1024,
                        "modificationTime": 1700000000000 + fidx,
                        "dataChange": True,
                        "stats": json.dumps(
                            {
                                "numRecords": rows_per_file,
                                "minValues": {"id": lo, "v": lo / 7.0},
                                "maxValues": {"id": hi, "v": hi / 7.0},
                                "nullCount": {"id": 0, "v": 3},
                            }
                        ),
                    }
                }
            )
            fidx += 1
        with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
            for a in actions + lines:
                f.write(json.dumps(a) + "\n")
        version += 1
    return path


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    light_mode = "--light" in sys.argv
    n_files = int(args[0]) if args else 100_000
    per_commit = int(args[1]) if len(args) > 1 else 2_000
    out: dict = {"n_files": n_files, "adds_per_commit": per_commit}

    root = os.environ.get("ADLS_META_SCALE_ROOT", "/tmp/adls_meta_scale")
    if light_mode:
        return light_main(root, n_files, out)
    if "--plan" in sys.argv:
        return plan_main(root, n_files, out, "--check-classic" in sys.argv)
    t0 = time.time()
    path = build_log(root, n_files, per_commit)
    out["build_log_s"] = round(time.time() - t0, 2)

    from athena_delta_lake_spark.delta.log import DeltaLog
    from athena_delta_lake_spark.delta.stats import (
        prune_files,
        prune_files_distributed,
    )
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    out["rss_before_replay_mib"] = round(rss_mib(), 1)
    t0 = time.time()
    log = DeltaLog(path)
    snap = log.snapshot()
    out["replay_json_s"] = round(time.time() - t0, 2)
    out["rss_after_replay_mib"] = round(rss_mib(), 1)
    assert snap.num_files == n_files, snap.num_files

    t0 = time.time()
    parts = max(1, n_files // 50_000)
    write_checkpoint(path, parts=parts)
    out["checkpoint_write_s"] = round(time.time() - t0, 2)
    out["checkpoint_parts"] = parts

    DeltaLog.clear_cache()  # the (path, version) snapshot cache is global
    t0 = time.time()
    snap2 = DeltaLog(path).snapshot()
    out["replay_checkpoint_s"] = round(time.time() - t0, 2)
    out["rss_after_ckpt_replay_mib"] = round(rss_mib(), 1)
    assert snap2.num_files == n_files

    preds = [
        ("day", ">=", "2024-03-01"),
        ("day", "<", "2024-04-01"),
        ("id", ">=", 1_000_000_000),
    ]
    t0 = time.time()
    py = prune_files(snap, preds)
    out["prune_python_s"] = round(time.time() - t0, 2)
    out["pruned_survivors"] = len(py)

    from athena_delta_lake_spark import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
    )
    t0 = time.time()
    dist = prune_files_distributed(spark, snap, preds)
    out["prune_distributed_s"] = round(time.time() - t0, 2)
    assert [f.path for f in dist] == [f.path for f in py], "prune mismatch"
    # second run without the first-job warmup overhead
    t0 = time.time()
    dist2 = prune_files_distributed(spark, snap, preds)
    out["prune_distributed_warm_s"] = round(time.time() - t0, 2)
    assert len(dist2) == len(py)

    t0 = time.time()
    fdf_count = snap.files_df(spark).count()
    out["files_df_s"] = round(time.time() - t0, 2)
    assert fdf_count == n_files
    out["rss_final_mib"] = round(rss_mib(), 1)
    spark.stop()
    print(json.dumps(out))
    return 0


def light_main(root: str, n_files: int, out: dict) -> int:
    """Measure snapshot_light + files_df + prune_df against the table a
    prior normal run prepared (checkpoint included) — fresh process, so
    RSS is the light path's own footprint."""
    from athena_delta_lake_spark import get_spark
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = os.path.join(root, "meta_scale_tbl")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        print(
            json.dumps({"error": "run the normal mode first to build the "
                        "table + checkpoint"}),
        )
        return 1
    out["mode"] = "light"
    out["rss_before_mib"] = round(rss_mib(), 1)
    t0 = time.time()
    light = DeltaLog(path).snapshot_light()
    out["snapshot_light_s"] = round(time.time() - t0, 2)
    out["rss_after_light_mib"] = round(rss_mib(), 1)
    out["overlay_adds"] = len(light.overlay_adds)
    out["checkpoint_parts"] = len(light.checkpoint_paths)

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
    )
    t0 = time.time()
    n = light.files_df(spark).count()
    out["files_df_count_s"] = round(time.time() - t0, 2)
    assert n == n_files, (n, n_files)
    preds = [
        ("day", ">=", "2024-03-01"),
        ("day", "<", "2024-04-01"),
        ("id", ">=", 1_000_000_000),
    ]
    t0 = time.time()
    out["prune_df_survivors"] = light.prune_df(spark, preds).count()
    out["prune_df_s"] = round(time.time() - t0, 2)
    out["rss_final_mib"] = round(rss_mib(), 1)
    spark.stop()
    print(json.dumps(out))
    return 0


def plan_main(root: str, n_files: int, out: dict, check_classic: bool) -> int:
    """Measure the auto-routed light PLANNING wiring (to_df +
    predicate DELETE) against the prepared table — fresh process, RSS
    asserted < 2 GiB regardless of file count."""
    from athena_delta_lake_spark import DeltaTable, get_spark
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = os.path.join(root, "meta_scale_tbl")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        print(
            json.dumps({"error": "run the normal mode first to build the "
                        "table + checkpoint"}),
        )
        return 1
    out["mode"] = "plan"
    os.environ.setdefault("ADLS_LIGHT_PLANNING_FILES", "1000000")
    out["rss_before_mib"] = round(rss_mib(), 1)
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
    )
    t = DeltaTable(spark, path)
    out["light_engaged"] = bool(t.log.light_planning_engaged())

    # ordinary to_df predicate planning: exactly what to_df(where=...)
    # executes before the scan itself (the scan reads only survivors, so
    # planning is the driver-memory-bearing part at 10^7 files)
    preds = [("day", "=", "2024-03-15"), ("id", ">=", 1_000_000_000)]
    t0 = time.time()
    snap = t._planning_snapshot(preds)
    out["to_df_planning_s"] = round(time.time() - t0, 2)
    out["planning_survivors"] = len(snap.files)
    out["rss_after_plan_mib"] = round(rss_mib(), 1)

    # predicate DELETE: partition-only -> metadata-only commit (no data
    # I/O, which is what lets this run on a synthetic metadata-only log)
    v_before = DeltaLog(path).latest_version()
    t0 = time.time()
    res = t.delete(where="day = '2024-06-01'")
    out["delete_s"] = round(time.time() - t0, 2)
    out["delete_files_removed"] = res["files_removed"]
    out["delete_files_added"] = res["files_added"]
    out["rss_after_delete_mib"] = round(rss_mib(), 1)
    peak = max(out["rss_after_plan_mib"], out["rss_after_delete_mib"])
    out["rss_under_2gib"] = bool(peak < 2048)
    assert out["light_engaged"], "light planning did not engage"
    assert res["files_added"] == 0, "partition delete must be metadata-only"
    assert peak < 2048, f"driver RSS {peak} MiB breaches the 2 GiB bar"

    # leave the prepared table unchanged for later runs
    os.remove(
        os.path.join(path, "_delta_log", f"{v_before + 1:020d}.json")
    )
    DeltaLog.clear_cache()

    if check_classic:
        from athena_delta_lake_spark.delta.stats import prune_files

        t0 = time.time()
        classic = DeltaLog(path).snapshot()
        out["classic_replay_s"] = round(time.time() - t0, 2)
        want = sorted(f.path for f in prune_files(classic, preds))
        got = sorted(f.path for f in snap.files)
        assert got == want, (
            f"light planning survivors diverge from classic: "
            f"{len(got)} vs {len(want)}"
        )
        out["classic_equality"] = "identical"
        out["rss_after_classic_mib"] = round(rss_mib(), 1)
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
