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
from .stats import Predicate, prune_files


def _join_path(base: str, rel: str) -> str:
    """URI-safe join for data-file paths (os.path.join breaks schemes)."""
    return base.rstrip("/") + "/" + rel


def _is_hive_style(files: list[AddFile], partition_columns: list[str]) -> bool:
    if not partition_columns:
        return True
    for f in files:
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
    use `DeltaTable.to_df(where=...)`) for exact semantics.
    """
    return read_files(spark, snapshot, prune_files(snapshot, predicates), columns)


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


def read_files(
    spark: SparkSession,
    snapshot: SnapshotState,
    files: list[AddFile],
    columns: list[str] | None = None,
) -> DataFrame:
    """Scan an explicit subset of a snapshot's files (partition columns
    materialized) — the unit the DML rewriters (dml.py) operate on."""
    schema = snapshot.schema
    part_cols = snapshot.partition_columns

    if not files:
        df = _empty_df(spark, schema)
        return df.select(*columns) if columns else df

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
