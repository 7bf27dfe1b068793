"""Change Data Feed (CDF) analog: row-level changes between commit versions,
derived purely from the copy-on-write transaction log.

The reference cannot do this (read-only latest-snapshot connector,
DeltaMetadataHandler.scala:99 — `snapshot` is always current). Delta's CDF
writes extra `_change_data` files; this engine's DML is copy-on-write at
file granularity, so the log already determines every change:

- `add` with dataChange=true in commit v  -> its rows were INSERTED at v
- `remove` with dataChange=true at v      -> its rows were DELETED at v
- UPDATE/MERGE appear as delete+insert (pre/post image pairs, not the
  `update_preimage`/`update_postimage` labels real CDF emits — documented
  approximation)
- OPTIMIZE/compaction commits (dataChange=false) produce NO changes,
  exactly like real CDF.

Scale: reading changes for a version range touches only the files those
commits added/removed — O(changed data), never a snapshot diff. Removed
files must still exist on disk (i.e. not yet VACUUMed) to read deletions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .log import DeltaLog, _decode_path
from .reader import read_files


def table_changes(
    spark: SparkSession,
    table_path: str,
    starting_version: int = 0,
    ending_version: int | None = None,
) -> DataFrame:
    """Rows changed in commits [starting_version, ending_version], with
    `_change_type` ('insert' | 'delete') and `_commit_version` columns —
    the `table_changes(...)` TVF shape."""
    log = DeltaLog(table_path)
    end = log.latest_version() if ending_version is None else ending_version
    pieces: list[DataFrame] = []
    for v in range(starting_version, end + 1):
        actions = log.commit_actions(v)
        add_paths = {
            _decode_path(a["add"]["path"])
            for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        }
        remove_paths = {
            _decode_path(a["remove"]["path"])
            for a in actions
            if "remove" in a and a["remove"].get("dataChange", True)
        }
        # merge-on-read commits remove+re-add the SAME path with a changed
        # deletion vector: the true change set is the newly-DV'd rows only
        # (emitting whole-file delete+insert would be wrong granularity)
        common = add_paths & remove_paths
        if common and v > 0:
            dv_piece = _dv_diff_deletes(spark, log, v, sorted(common))
            if dv_piece is not None:
                pieces.append(
                    dv_piece.withColumn("_change_type", F.lit("delete"))
                    .withColumn("_commit_version", F.lit(v))
                )
            add_paths -= common
            remove_paths -= common
        if add_paths:
            snap = log.snapshot(v)
            files = [f for f in snap.files if f.path in add_paths]
            pieces.append(
                read_files(spark, snap, files)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_version", F.lit(v))
            )
        if remove_paths and v > 0:
            prev = log.snapshot(v - 1)
            files = [f for f in prev.files if f.path in remove_paths]
            pieces.append(
                read_files(spark, prev, files)
                .withColumn("_change_type", F.lit("delete"))
                .withColumn("_commit_version", F.lit(v))
            )
    if not pieces:
        schema = log.snapshot(end).schema
        empty = spark.createDataFrame([], schema)
        return empty.withColumn(
            "_change_type", F.lit("").cast("string")
        ).withColumn("_commit_version", F.lit(0).cast("int")).limit(0)
    out = pieces[0]
    for p in pieces[1:]:
        # allowMissingColumns: schema evolution mid-range reads NULL
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def _dv_diff_deletes(
    spark: SparkSession, log: DeltaLog, v: int, paths: list[str]
) -> DataFrame | None:
    """Rows newly covered by a deletion vector in commit v: positions in
    the new DV minus the old one, read from the PREVIOUS snapshot (whose
    scan still shows them) keyed by (file, row_index)."""
    import os

    from .deletion_vectors import read_dv_positions
    from .reader import read_files_with_index

    prev = log.snapshot(v - 1)
    snap = log.snapshot(v)
    prev_by = {f.path: f for f in prev.files}
    new_by = {f.path: f for f in snap.files}

    def _positions(f) -> set[int]:
        if f is None or f.deletion_vector is None:
            return set()
        return set(read_dv_positions(log.table_path, f.deletion_vector))

    rows: list[tuple[str, int]] = []
    read_targets = []
    for p in paths:
        pf, nf = prev_by.get(p), new_by.get(p)
        if pf is None or nf is None:
            continue
        newly = _positions(nf) - _positions(pf)
        if newly:
            full = os.path.abspath(os.path.join(log.table_path, p))
            rows.extend((full, i) for i in sorted(newly))
            read_targets.append(pf)
    if not rows:
        return None
    pos_df = spark.createDataFrame(rows, "_file string, _row_idx long")
    base = read_files_with_index(spark, prev, read_targets)
    return base.join(pos_df, ["_file", "_row_idx"]).drop("_file", "_row_idx")
