"""Storage-layout catalog: metastore-less schema/table discovery.

The reference discovers databases by listing S3 keys with the EMR
`_$folder$` marker suffix (unpaginated, single bucket —
/root/reference/DeltaMetadataHandler.scala:24,42-55; Config.scala:4) and
tables as second-level folders (:79-88). The rebuild discovers REAL
directories (works on any filesystem Spark can reach; no marker objects, no
1000-key truncation), identifies Delta tables by the presence of
`_delta_log/`, bare-parquet tables otherwise, and registers them as temp
views so plain `spark.sql` works over the whole catalog.

Layout convention (same two-level shape the reference mandates):
    <root>/<database>/<table>/{_delta_log/ | *.parquet}
plus a flat mode for fixture dirs that are just `<root>/<table>.parquet`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .delta.table import DeltaTable


def _is_delta_dir(path: str) -> bool:
    return os.path.isdir(os.path.join(path, "_delta_log"))


def _has_parquet(path: str) -> bool:
    if os.path.isfile(path) and path.endswith(".parquet"):
        return True
    if not os.path.isdir(path):
        return False
    for name in os.listdir(path):
        if name.endswith(".parquet") or (
            os.path.isdir(os.path.join(path, name)) and "=" in name
        ):
            return True
    return False


class DeltaPond:
    """In-process catalog facade (reference entry point analogue,
    DeltaCompositeHandler.scala:5 — but a Python object, not a Lambda)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    # reference: doListSchemaNames (DeltaMetadataHandler.scala:74-77)
    def list_schemas(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)) and not d.startswith((".", "_"))
        )

    # reference: doListTables (DeltaMetadataHandler.scala:79-88)
    def list_tables(self, schema: str) -> list[str]:
        base = os.path.join(self.root, schema)
        out = []
        for d in sorted(os.listdir(base)):
            p = os.path.join(base, d)
            if d.startswith((".", "_")):
                continue
            if _is_delta_dir(p) or _has_parquet(p):
                out.append(d.removesuffix(".parquet"))
        return out

    def table_path(self, schema: str, table: str) -> str:
        p = os.path.join(self.root, schema, table)
        if os.path.exists(p):
            return p
        if os.path.exists(p + ".parquet"):
            return p + ".parquet"
        raise FileNotFoundError(f"no such table: {schema}.{table}")

    def table(self, schema: str, table: str) -> DeltaTable:
        p = self.table_path(schema, table)
        if not _is_delta_dir(p):
            raise ValueError(f"{schema}.{table} is not a Delta table (use read())")
        return DeltaTable(self.spark, p)

    def read(self, schema: str, table: str) -> DataFrame:
        """Read any table: Delta via native snapshot, else plain parquet."""
        p = self.table_path(schema, table)
        if _is_delta_dir(p):
            return DeltaTable(self.spark, p).to_df()
        return self.spark.read.parquet(p)

    def register_all(self, schema: str, prefix: str = "") -> list[str]:
        """Register every table in `schema` as a temp view -> spark.sql works."""
        names = []
        for t in self.list_tables(schema):
            self.read(schema, t).createOrReplaceTempView(prefix + t)
            names.append(prefix + t)
        return names


def register_flat_dir(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register a fixture dir of `<name>.parquet` files as temp views."""
    names = []
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            name = f.removesuffix(".parquet")
            spark.read.parquet(os.path.join(sf_dir, f)).createOrReplaceTempView(name)
            names.append(name)
    return names
