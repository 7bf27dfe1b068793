"""Snapshot -> DataFrame: the scan operator.

Replaces the whole of the reference's record handler
(/root/reference/DeltaRecordHandler.scala:116-155 — row-at-a-time parquet4s
read, hand-built extractors, literal partition injection) with Spark's
vectorized Parquet reader driven by the log-derived schema and the pruned
live-file list.

Two layouts:
- hive-style paths (`k=v` directory segments for every partition column —
  what Spark and virtually every Delta writer produce): ONE
  `spark.read.schema(full).option("basePath", root).parquet(*files)` call.
  Partition columns materialize from paths, typed by the provided schema;
  Catalyst partition pruning / pushdown apply on top.
- arbitrary paths: files grouped by their `partitionValues` tuple, each group
  scanned once and partition columns injected with typed `F.lit`s, then
  `unionByName`. (Generalizes the reference's int-literal extractor,
  DeltaRecordHandler.scala:109-114, to any type.)

Scale note: the scan parallelism comes from Spark's file-source partitioning
(`spark.sql.files.maxPartitionBytes`) — the equivalent of the reference's
one-Lambda-per-file fan-out (DeltaMetadataHandler.scala:173-181) but with
split coalescing/splitting, locality, and vectorized decode.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .log import AddFile, SnapshotState, typed_partition_values
from .stats import Predicate, prune_files_auto


def _join_path(base: str, rel: str) -> str:
    """URI-safe join for data-file paths (os.path.join breaks schemes).
    Absolute `rel` (shallow-clone adds, Delta spec allows absolute add
    paths) passes through untouched."""
    if rel.startswith("/") or "://" in rel:
        return rel
    return base.rstrip("/") + "/" + rel


def _is_hive_style(files: list[AddFile], partition_columns: list[str]) -> bool:
    if not partition_columns:
        return True
    for f in files:
        if f.path.startswith("/") or "://" in f.path:
            # absolute paths (shallow clones) live outside the table root:
            # basePath partition discovery cannot apply — inject literals
            return False
        segs = dict(
            seg.split("=", 1) for seg in f.path.split("/")[:-1] if "=" in seg
        )
        if not all(c in segs for c in partition_columns):
            return False
    return True


def _empty_df(spark: SparkSession, schema: T.StructType) -> DataFrame:
    return spark.createDataFrame([], schema)


def read_snapshot(
    spark: SparkSession,
    snapshot: SnapshotState,
    predicates: Iterable[Predicate] | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Materialize a snapshot as a DataFrame, file-pruned by `predicates`.

    `predicates` prune files driver-side (partition values + stats); they are
    NOT applied row-level here — pass the same condition to `.filter()` (or
    use `DeltaTable.to_df(where=...)`) for exact semantics. Past
    `stats.distributed_prune_threshold()` files the predicate evaluation
    itself runs as a Spark job over the file metadata
    (prune_files_distributed) so million-file tables have no
    O(files × predicates) driver loop.
    """
    return read_files(
        spark, snapshot, prune_files_auto(spark, snapshot, predicates), columns
    )


def _physical_rename(dt: T.DataType) -> T.DataType:
    """Recursively rename struct fields to their column-mapping physical
    names (delta.columnMapping.physicalName in field metadata)."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    (f.metadata or {}).get(
                        "delta.columnMapping.physicalName", f.name
                    ),
                    _physical_rename(f.dataType),
                    f.nullable,
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_physical_rename(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _physical_rename(dt.keyType),
            _physical_rename(dt.valueType),
            dt.valueContainsNull,
        )
    return dt


def _read_mapped_files(
    spark: SparkSession, snapshot: SnapshotState, files: list[AddFile]
) -> DataFrame:
    """Column-mapping read path: parquet files carry PHYSICAL names (and
    hive dirs, if any, use physical partition names), so every file is read
    with the physically-renamed data schema and cast back — struct casts
    are positional, which renames nested fields in one expression. The
    snapshot's partition_values were normalized to logical names at replay
    (log.py), so partition columns inject as typed logical literals."""
    schema = snapshot.schema
    part_cols = snapshot.partition_columns
    type_by_name = {f.name: f.dataType for f in schema.fields}
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    phys_data_schema = T.StructType(
        [
            T.StructField(
                (f.metadata or {}).get(
                    "delta.columnMapping.physicalName", f.name
                ),
                _physical_rename(f.dataType),
                f.nullable,
            )
            for f in data_fields
        ]
    )
    by_part: dict[tuple, list[str]] = {}
    for f in files:
        key = typed_partition_values(f, schema, part_cols)
        by_part.setdefault(key, []).append(_join_path(snapshot.table_path, f.path))
    pieces = []
    for pvals, ppaths in by_part.items():
        piece = spark.read.schema(phys_data_schema).parquet(*ppaths)
        cols = [
            F.col(pf.name).cast(lf.dataType).alias(lf.name)
            for pf, lf in zip(phys_data_schema.fields, data_fields)
        ]
        piece = piece.select(*cols)
        for c, v in zip(part_cols, pvals):
            piece = piece.withColumn(c, F.lit(v).cast(type_by_name[c]))
        pieces.append(piece.select(*[f.name for f in schema.fields]))
    df = pieces[0]
    for p in pieces[1:]:
        df = df.unionByName(p)
    return df


def _column_mapping_active(snapshot: SnapshotState) -> bool:
    config = snapshot.metadata.get("configuration") or {}
    return config.get("delta.columnMapping.mode", "none") != "none"


def _strip_scheme(col: F.Column) -> F.Column:
    """file:///tmp/x and /tmp/x compare equal (join key normalization)."""
    return F.regexp_replace(col, r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+", "/")


def _deleted_positions_df(
    spark: SparkSession, table_path: str, files: list[AddFile]
) -> DataFrame:
    """(file path, deleted row index) rows for every DV'd file.

    Descriptors (tiny metadata) are distributed and the bitmaps parsed
    EXECUTOR-side via mapInPandas — a table with millions of deleted rows
    never routes bitmap bytes through the driver."""
    import json as _json

    # resolve driver-side so absolute add paths (shallow clones) keep
    # matching the scan's _metadata.file_path
    rows = [
        (_join_path(table_path, f.path), _json.dumps(f.deletion_vector))
        for f in files
    ]
    desc = spark.createDataFrame(rows, "full string, dv string")
    if len(rows) > 1:
        desc = desc.repartition(min(len(rows), 64))
    tp = table_path.rstrip("/")

    def expand(batches):
        import json as _j

        import pandas as _pd

        from athena_delta_lake_spark.delta.deletion_vectors import (
            read_dv_positions,
        )

        for pdf in batches:
            for full, d in zip(pdf["full"], pdf["dv"]):
                pos = read_dv_positions(tp, _j.loads(d))
                yield _pd.DataFrame(
                    {
                        "_del_fp": _pd.Series([full] * len(pos)),
                        "_del_idx": _pd.Series(pos, dtype="int64"),
                    }
                )

    out = desc.mapInPandas(expand, "_del_fp string, _del_idx long")
    return out.withColumn("_del_fp", _strip_scheme(F.col("_del_fp")))


def _read_dv_files(
    spark: SparkSession, snapshot: SnapshotState, files: list[AddFile]
) -> DataFrame:
    """Scan files that carry deletion vectors (canonical columns only)."""
    schema = snapshot.schema
    return _read_with_meta(spark, snapshot, files).select(
        *[f.name for f in schema.fields]
    )


def read_files_with_index(
    spark: SparkSession,
    snapshot: SnapshotState,
    files: list[AddFile],
    extra_fields: list[T.StructField] | None = None,
) -> DataFrame:
    """DV-filtered scan that ALSO exposes `_file` (scheme-stripped absolute
    path) and `_row_idx` (parquet row index) — the substrate for DV-writing
    DML (dml.delete_mor): matched rows map straight back to per-file
    deletion-vector positions."""
    df = _read_with_meta(spark, snapshot, files, extra_fields=extra_fields)
    return df.withColumnRenamed("_dv_fp", "_file").withColumnRenamed(
        "_dv_idx", "_row_idx"
    )


def _read_with_meta(
    spark: SparkSession,
    snapshot: SnapshotState,
    files: list[AddFile],
    extra_fields: list[T.StructField] | None = None,
) -> DataFrame:
    """Read any file subset WITH `_metadata.row_index`, applying deletion
    vectors: anti-join the deleted (file, index) pairs of DV'd files, then
    inject typed partition-column literals (works for hive and arbitrary
    layouts alike). Column-mapped tables read their physical schema and
    cast back, same as _read_mapped_files."""
    schema = snapshot.schema
    part_cols = snapshot.partition_columns
    mapped = _column_mapping_active(snapshot)
    type_by_name = {f.name: f.dataType for f in schema.fields}
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    if mapped:
        read_schema = T.StructType(
            [
                T.StructField(
                    (f.metadata or {}).get(
                        "delta.columnMapping.physicalName", f.name
                    ),
                    _physical_rename(f.dataType),
                    f.nullable,
                )
                for f in data_fields
            ]
        )
    else:
        read_schema = T.StructType(data_fields)
    # hidden physical columns (e.g. materialized row ids): appended to the
    # read schema verbatim — files that lack them surface NULLs
    extra_names = [f.name for f in (extra_fields or [])]
    if extra_fields:
        read_schema = T.StructType(list(read_schema.fields) + list(extra_fields))

    by_part: dict[tuple, list[str]] = {}
    for f in files:
        key = typed_partition_values(f, schema, part_cols)
        by_part.setdefault(key, []).append(_join_path(snapshot.table_path, f.path))
    pieces = []
    for pvals, ppaths in by_part.items():
        piece = spark.read.schema(read_schema).parquet(*ppaths).select(
            "*",
            _strip_scheme(F.col("_metadata.file_path")).alias("_dv_fp"),
            F.col("_metadata.row_index").alias("_dv_idx"),
        )
        if mapped:
            cols = [
                F.col(pf.name).cast(lf.dataType).alias(lf.name)
                for pf, lf in zip(read_schema.fields, data_fields)
            ]
            piece = piece.select(*cols, *extra_names, "_dv_fp", "_dv_idx")
        for c, v in zip(part_cols, pvals):
            piece = piece.withColumn(c, F.lit(v).cast(type_by_name[c]))
        pieces.append(piece)
    if not pieces:
        # empty snapshot (e.g. freshly TRUNCATEd): correct schema, 0 rows
        empty_schema = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in data_fields]
            + [
                T.StructField(f.name, f.dataType, True)
                for f in (extra_fields or [])
            ]
            + [
                T.StructField("_dv_fp", T.StringType(), True),
                T.StructField("_dv_idx", T.LongType(), True),
            ]
            + [T.StructField(c, type_by_name[c], True) for c in part_cols]
        )
        return spark.createDataFrame([], empty_schema)
    df = pieces[0]
    for p in pieces[1:]:
        df = df.unionByName(p)

    dv_files = [f for f in files if f.deletion_vector]
    if dv_files:
        deleted = _deleted_positions_df(spark, snapshot.table_path, dv_files)
        df = df.join(
            deleted,
            (df["_dv_fp"] == deleted["_del_fp"])
            & (df["_dv_idx"] == deleted["_del_idx"]),
            "left_anti",
        )
    return df.select(
        *[f.name for f in schema.fields], *extra_names, "_dv_fp", "_dv_idx"
    )


def read_files_with_row_ids(
    spark: SparkSession, snapshot: SnapshotState, files: list[AddFile]
) -> DataFrame:
    """DV-filtered scan exposing STABLE `_row_id` and
    `_row_commit_version` (rowTracking): per row,
    coalesce(materialized column, file baseRowId + parquet row index) —
    fresh files answer from log metadata, rewritten files from the
    materialized hidden columns the rewriter carried, so ids survive
    OPTIMIZE and copy-on-write DML."""
    from .writer import (
        MATERIALIZED_RCV_COL,
        MATERIALIZED_ROW_ID_COL,
    )

    extra = [
        T.StructField(MATERIALIZED_ROW_ID_COL, T.LongType(), True),
        T.StructField(MATERIALIZED_RCV_COL, T.LongType(), True),
    ]
    df = _read_with_meta(spark, snapshot, files, extra_fields=extra)
    base = _base_ids_df(spark, snapshot, files)
    schema_cols = [f.name for f in snapshot.schema.fields]
    out = (
        df.join(F.broadcast(base), df["_dv_fp"] == base["_rt_fp"], "left")
        .withColumn(
            "_row_id",
            F.coalesce(
                F.col(MATERIALIZED_ROW_ID_COL),
                F.col("_rt_base") + F.col("_dv_idx"),
            ),
        )
        .withColumn(
            "_row_commit_version",
            F.coalesce(F.col(MATERIALIZED_RCV_COL), F.col("_rt_dcv")),
        )
    )
    return out.select(*schema_cols, "_row_id", "_row_commit_version")


def _base_ids_df(
    spark: SparkSession, snapshot: SnapshotState, files: list[AddFile]
) -> DataFrame:
    """(scheme-stripped absolute path, baseRowId, defaultRowCommitVersion)
    per file — the broadcastable metadata side of id resolution."""
    base_rows = [
        (
            _strip_scheme_py(_join_path(snapshot.table_path, f.path)),
            f.base_row_id,
            f.default_row_commit_version,
        )
        for f in files
    ]
    return spark.createDataFrame(
        base_rows, "_rt_fp string, _rt_base long, _rt_dcv long"
    )


def read_files_preserving_row_ids(
    spark: SparkSession, snapshot: SnapshotState, files: list[AddFile]
) -> DataFrame:
    """Rewrite-side read: schema columns PLUS the materialized row-id /
    commit-version columns populated for every surviving row — staging the
    result writes them into the rewritten files, which is how row ids
    survive copy-on-write DML and OPTIMIZE."""
    from .writer import MATERIALIZED_RCV_COL, MATERIALIZED_ROW_ID_COL

    df = read_files_with_row_ids(spark, snapshot, files)
    return df.withColumnRenamed(
        "_row_id", MATERIALIZED_ROW_ID_COL
    ).withColumnRenamed("_row_commit_version", MATERIALIZED_RCV_COL)


def _strip_scheme_py(p: str) -> str:
    import re as _re

    return _re.sub(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+", "/", p)


def read_files(
    spark: SparkSession,
    snapshot: SnapshotState,
    files: list[AddFile],
    columns: list[str] | None = None,
) -> DataFrame:
    """Scan an explicit subset of a snapshot's files (partition columns
    materialized) — the unit the DML rewriters (dml.py) operate on.

    Files carrying a deletion vector (deletionVectors reader feature) are
    routed through a row-index-filtered read (`_read_dv_files`); files
    without one take the plain vectorized path untouched — a table where
    only 1% of files have DVs pays the DV anti-join on that 1% only.
    """
    schema = snapshot.schema

    if not files:
        df = _empty_df(spark, schema)
        return df.select(*columns) if columns else df

    dv_files = [f for f in files if f.deletion_vector]
    if dv_files:
        plain = [f for f in files if not f.deletion_vector]
        pieces = []
        if plain:
            pieces.append(read_files(spark, snapshot, plain))
        pieces.append(_read_dv_files(spark, snapshot, dv_files))
        df = pieces[0]
        for p in pieces[1:]:
            df = df.unionByName(p)
        return df.select(*columns) if columns else df

    part_cols = snapshot.partition_columns

    if _column_mapping_active(snapshot):
        df = _read_mapped_files(spark, snapshot, files)
        return df.select(*columns) if columns else df

    paths = [_join_path(snapshot.table_path, f.path) for f in files]
    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_schema = T.StructType(data_fields)

    if _is_hive_style(files, part_cols):
        reader = spark.read.schema(schema if part_cols else data_schema)
        if part_cols:
            reader = reader.option("basePath", snapshot.table_path)
        df = reader.parquet(*paths)
        df = df.select(*[f.name for f in schema.fields])  # canonical column order
    else:
        by_part: dict[tuple, list[str]] = {}
        for f in files:
            key = typed_partition_values(f, schema, part_cols)
            by_part.setdefault(key, []).append(
                _join_path(snapshot.table_path, f.path)
            )
        pieces = []
        type_by_name = {f.name: f.dataType for f in schema.fields}
        for pvals, ppaths in by_part.items():
            piece = spark.read.schema(data_schema).parquet(*ppaths)
            for c, v in zip(part_cols, pvals):
                piece = piece.withColumn(c, F.lit(v).cast(type_by_name[c]))
            pieces.append(piece.select(*[f.name for f in schema.fields]))
        df = pieces[0]
        for p in pieces[1:]:
            df = df.unionByName(p)

    if columns:
        df = df.select(*columns)
    return df
