"""Native Delta Lake core: log replay, snapshot, pruning, scan, write."""

from .dml import compact, delete, delete_mor, merge_upsert, restore_table, update, vacuum
from .features import drop_feature
from .log import AddFile, DeltaLog, SnapshotState
from .reader import read_files, read_snapshot
from .stats import prune_files
from .table import DeltaTable
from .types import schema_string_to_struct, struct_to_schema_string
from .writer import (
    add_columns,
    clone_table,
    drop_column,
    enable_column_mapping,
    enable_row_tracking,
    rename_column,
    cleanup_log,
    convert_to_delta,
    set_domain_metadata,
    set_table_properties,
    unset_table_properties,
    write_checkpoint,
    write_delta,
)

__all__ = [
    "AddFile",
    "DeltaLog",
    "DeltaTable",
    "SnapshotState",
    "add_columns",
    "cleanup_log",
    "clone_table",
    "compact",
    "convert_to_delta",
    "delete",
    "drop_column",
    "enable_column_mapping",
    "enable_row_tracking",
    "delete_mor",
    "drop_feature",
    "merge_upsert",
    "prune_files",
    "read_files",
    "read_snapshot",
    "rename_column",
    "restore_table",
    "schema_string_to_struct",
    "set_domain_metadata",
    "set_table_properties",
    "struct_to_schema_string",
    "unset_table_properties",
    "update",
    "vacuum",
    "write_checkpoint",
    "write_delta",
]
