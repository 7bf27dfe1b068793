"""Scan-layout tests for reader.py: hive-style paths use one basePath read;
arbitrary (non-hive) file layouts fall back to typed literal injection of
partition values (generalizing the reference's int-only literal extractor,
DeltaRecordHandler.scala:109-114)."""

import json
import os

from pyspark.sql import functions as F

from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.reader import read_snapshot


def _mk_nonhive_table(spark, root):
    """A Delta table whose data files are NOT in k=v directories — the layout
    some writers produce (random file prefixes, partition values only in the
    log). Partition column: p string (incl. a null partition)."""
    os.makedirs(root)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    files = {}
    for i, p in enumerate(["x", "y", None]):
        name = f"f{i}.parquet"
        df = spark.createDataFrame([(i * 10 + j,) for j in range(5)], "id long")
        df.coalesce(1).write.parquet(os.path.join(root, f"_tmp{i}"))
        src = next(
            f
            for f in os.listdir(os.path.join(root, f"_tmp{i}"))
            if f.endswith(".parquet")
        )
        os.rename(os.path.join(root, f"_tmp{i}", src), os.path.join(root, name))
        files[name] = p

    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir)
    actions = [
        {
            "metaData": {
                "id": "t",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["p"],
                "configuration": {},
            }
        }
    ]
    for name, p in files.items():
        actions.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {"p": p},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            }
        )
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


def test_nonhive_layout_partition_injection(spark, tmp_path):
    root = _mk_nonhive_table(spark, str(tmp_path / "nonhive"))
    DeltaLog.clear_cache()
    snap = DeltaLog(root).snapshot()
    df = read_snapshot(spark, snap)
    rows = df.collect()
    assert len(rows) == 15
    by_p = {}
    for r in rows:
        by_p.setdefault(r["p"], []).append(r["id"])
    assert sorted(by_p["x"]) == [0, 1, 2, 3, 4]
    assert sorted(by_p["y"]) == [10, 11, 12, 13, 14]
    assert sorted(by_p[None]) == [20, 21, 22, 23, 24]
    # partition predicate prunes to one file's rows
    pruned = read_snapshot(spark, snap, predicates=[("p", "=", "y")])
    assert sorted(r["id"] for r in pruned.collect()) == [10, 11, 12, 13, 14]
    # column selection works across the union-of-literals plan
    assert read_snapshot(spark, snap, columns=["id"]).columns == ["id"]
