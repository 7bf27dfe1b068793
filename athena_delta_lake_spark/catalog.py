"""Storage-layout catalog: metastore-less schema/table discovery.

The reference discovers databases by listing S3 keys with the EMR
`_$folder$` marker suffix (unpaginated, single bucket —
/root/reference/DeltaMetadataHandler.scala:24,42-55; Config.scala:4) and
tables as second-level folders (:79-88). The rebuild discovers REAL
directories through the filesystem facade (delta/fs.py) — local paths or
any Hadoop-connector scheme (s3a://, gs://, abfs://, hdfs://) — with no
marker objects and no 1000-key truncation; identifies Delta tables by the
presence of `_delta_log/`, bare-parquet tables otherwise, and registers
them as temp views so plain `spark.sql` works over the whole catalog.

Layout convention (same two-level shape the reference mandates):
    <root>/<database>/<table>/{_delta_log/ | *.parquet}
plus a flat mode for fixture dirs that are just `<root>/<table>.parquet`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .delta.fs import get_fs
from .delta.table import DeltaTable


def _join(*parts: str) -> str:
    return "/".join(p.rstrip("/") for p in parts)


class DeltaPond:
    """In-process catalog facade (reference entry point analogue,
    DeltaCompositeHandler.scala:5 — but a Python object, not a Lambda)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._fs = get_fs(self.root, spark)

    def _is_delta_dir(self, path: str) -> bool:
        return self._fs.is_dir(_join(path, "_delta_log"))

    def _has_parquet(self, path: str) -> bool:
        if path.endswith(".parquet") and self._fs.exists(path):
            return True
        if not self._fs.is_dir(path):
            return False
        for fi in self._fs.listdir(path):
            if fi.name.endswith(".parquet") or "=" in fi.name:
                return True
        return False

    # reference: doListSchemaNames (DeltaMetadataHandler.scala:74-77)
    def list_schemas(self) -> list[str]:
        return sorted(
            fi.name
            for fi in self._fs.listdir(self.root)
            if self._fs.is_dir(_join(self.root, fi.name))
            and not fi.name.startswith((".", "_"))
        )

    # reference: doListTables (DeltaMetadataHandler.scala:79-88)
    def list_tables(self, schema: str) -> list[str]:
        base = _join(self.root, schema)
        out = []
        for fi in sorted(self._fs.listdir(base), key=lambda f: f.name):
            p = _join(base, fi.name)
            if fi.name.startswith((".", "_")):
                continue
            if self._is_delta_dir(p) or self._has_parquet(p):
                out.append(fi.name.removesuffix(".parquet"))
        return out

    def table_path(self, schema: str, table: str) -> str:
        p = _join(self.root, schema, table)
        if self._fs.exists(p):
            return p
        if self._fs.exists(p + ".parquet"):
            return p + ".parquet"
        raise FileNotFoundError(f"no such table: {schema}.{table}")

    def table(self, schema: str, table: str) -> DeltaTable:
        p = self.table_path(schema, table)
        if not self._is_delta_dir(p):
            raise ValueError(f"{schema}.{table} is not a Delta table (use read())")
        return DeltaTable(self.spark, p)

    def read(self, schema: str, table: str) -> DataFrame:
        """Read any table: Delta via native snapshot, else plain parquet."""
        p = self.table_path(schema, table)
        if self._is_delta_dir(p):
            return DeltaTable(self.spark, p).to_df()
        return self.spark.read.parquet(p)

    def create_schema(self, schema: str) -> None:
        """Storage-layout catalog: a schema IS a top-level directory."""
        import os

        os.makedirs(_join(self.root, schema), exist_ok=True)

    def create_table(
        self,
        schema: str,
        table: str,
        df: DataFrame,
        mode: str = "append",
        partition_by: list[str] | None = None,
    ) -> DeltaTable:
        """Write `df` as a Delta table under <root>/<schema>/<table> — the
        catalog CRUD the read-only reference lacked (its tables had to be
        created by an external writer)."""
        import os

        from .delta.writer import write_delta

        if schema not in self.list_schemas():
            raise ValueError(f"no such schema: {schema}")
        path = _join(self.root, schema, table)
        os.makedirs(path, exist_ok=True)
        write_delta(df, path, mode=mode, partition_by=partition_by)
        return DeltaTable(self.spark, path)

    def drop_table(self, schema: str, table: str) -> None:
        """Remove the table directory (storage-layout catalog: dropping a
        table IS deleting its folder)."""
        import shutil

        from .delta.log import DeltaLog

        shutil.rmtree(self.table_path(schema, table))
        DeltaLog.clear_cache()

    def register_all(self, schema: str, prefix: str = "") -> list[str]:
        """Register every table in `schema` as a temp view -> spark.sql works."""
        names = []
        for t in self.list_tables(schema):
            self.read(schema, t).createOrReplaceTempView(prefix + t)
            names.append(prefix + t)
        return names

    def _missing_relation(self, exc) -> str | None:
        """The unresolved relation name an AnalysisException complains
        about, or None when the error is something else."""
        try:
            if exc.getErrorClass() != "TABLE_OR_VIEW_NOT_FOUND":
                return None
            raw = exc.getMessageParameters().get("relationName", "")
        except Exception:
            return None
        return raw.replace("`", "") or None

    def _schema_for(self, table: str) -> str:
        hits = [s for s in self.list_schemas() if table in self.list_tables(s)]
        if not hits:
            raise FileNotFoundError(f"no pond table named {table!r}")
        if len(hits) > 1:
            raise ValueError(
                f"table {table!r} exists in several schemas {hits}; "
                f"qualify it as <schema>.{table}"
            )
        return hits[0]

    def sql(self, query: str, _max_resolves: int = 20) -> DataFrame:
        """Plain SQL over the pond with tables resolved lazily AT
        NAME-LOOKUP TIME — the reference's headline capability ("query
        DeltaLake tables ... without having to register those tables on AWS
        Glue (or any other Metastore)", reference README.md:5-6): no
        registration step, no metastore. Each relation the analyzer cannot
        resolve triggers storage-layout lookup + Delta log replay (the
        doGetTable analogue, DeltaMetadataHandler.scala:90-107) and binds a
        view; the query then re-plans. Bare names search every schema;
        `schema.table` names bind through a mangled view (Spark temp views
        cannot be dotted) with the query text rewritten to match.

        Resolution is per-query-failure, so an N-table query costs N
        re-plans on first touch and zero afterwards (views persist in the
        session; snapshot cache keeps log replay O(1) when unchanged)."""
        import re

        from pyspark.errors import AnalysisException

        q = query
        for _ in range(_max_resolves):
            try:
                return self.spark.sql(q)
            except AnalysisException as e:
                name = self._missing_relation(e)
                if name is None:
                    raise
                parts = name.split(".")
                if len(parts) == 1:
                    schema = self._schema_for(parts[0])
                    self.read(schema, parts[0]).createOrReplaceTempView(parts[0])
                elif len(parts) == 2 and parts[0] in self.list_schemas():
                    view = f"__pond__{parts[0]}__{parts[1]}"
                    self.read(parts[0], parts[1]).createOrReplaceTempView(view)
                    pat = re.compile(
                        r"\b" + re.escape(parts[0]) + r"\s*\.\s*"
                        + re.escape(parts[1]) + r"\b",
                        re.IGNORECASE,
                    )
                    new_q = pat.sub(view, q)
                    if new_q == q:  # nothing rewritten: would loop forever
                        raise
                    q = new_q
                else:
                    raise
        raise RuntimeError(f"gave up resolving relations after {_max_resolves} passes")


def register_flat_dir(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register a fixture dir of `<name>.parquet` files as temp views."""
    names = []
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            name = f.removesuffix(".parquet")
            spark.read.parquet(os.path.join(sf_dir, f)).createOrReplaceTempView(name)
            names.append(name)
    return names
