"""Column-mapping (delta.columnMapping.mode=name) READ support: tables
whose parquet files carry physical names like `col-<uuid>` — the layout
Databricks writers produce after ALTER/DROP COLUMN. The reference would
surface physical names or crash; here logical names come from the schema
metadata, partitionValues/stats keys are normalized to logical at replay
(log.py), and the scan reads physical + casts back (reader.py)."""

import json
import os

import pytest

from athena_delta_lake_spark import DeltaTable


SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaa111",
                },
            },
            {
                "name": "payload",
                "type": {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "score",
                            "type": "double",
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": 3,
                                "delta.columnMapping.physicalName": "col-ccc333",
                            },
                        }
                    ],
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbb222",
                },
            },
            {
                "name": "part",
                "type": "integer",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 4,
                    "delta.columnMapping.physicalName": "col-ddd444",
                },
            },
        ],
    }
)


@pytest.fixture()
def mapped_tbl(spark, tmp_path):
    """Hand-built column-mapped table: physical names in files and dirs,
    partitionValues/stats keyed physically in the log."""
    path = str(tmp_path / "mapped")
    for part in (1, 2):
        df = spark.createDataFrame(
            [(i + part * 10, (float(i),)) for i in range(5)],
            "`col-aaa111` long, `col-bbb222` struct<`col-ccc333`: double>",
        )
        out_dir = os.path.join(path, f"col-ddd444={part}")
        df.coalesce(1).write.mode("overwrite").parquet(out_dir)

    log_dir = os.path.join(path, "_delta_log")
    os.makedirs(log_dir)
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "t-mapped",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": SCHEMA_STRING,
                "partitionColumns": ["part"],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": "4",
                },
            }
        },
    ]
    for part in (1, 2):
        out_dir = os.path.join(path, f"col-ddd444={part}")
        fname = next(n for n in os.listdir(out_dir) if n.endswith(".parquet"))
        actions.append(
            {
                "add": {
                    "path": f"col-ddd444={part}/{fname}",
                    "partitionValues": {"col-ddd444": str(part)},
                    "size": os.path.getsize(os.path.join(out_dir, fname)),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps(
                        {
                            "numRecords": 5,
                            "minValues": {"col-aaa111": part * 10},
                            "maxValues": {"col-aaa111": part * 10 + 4},
                            "nullCount": {"col-aaa111": 0},
                        }
                    ),
                }
            }
        )
    with open(os.path.join(log_dir, "00000000000000000000.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return path


def test_logical_schema_and_values(spark, mapped_tbl):
    t = DeltaTable(spark, mapped_tbl)
    assert [f.name for f in t.schema().fields] == ["id", "payload", "part"]
    df = t.to_df()
    assert df.columns == ["id", "payload", "part"]
    rows = df.selectExpr("id", "payload.score", "part").collect()
    assert len(rows) == 10
    assert {r["part"] for r in rows} == {1, 2}
    got = {(r["id"], r["score"]) for r in rows if r["part"] == 1}
    assert got == {(i + 10, float(i)) for i in range(5)}


def test_partition_and_stats_pruning_logical(spark, mapped_tbl):
    t = DeltaTable(spark, mapped_tbl)
    # partition predicate on the LOGICAL name prunes to one file
    assert len(t.pruned_files([("part", "=", 2)])) == 1
    # stats predicate on the logical name prunes via remapped minValues
    assert len(t.pruned_files([("id", ">=", 20)])) == 1
    assert t.to_df(where=[("part", "=", 2)]).count() == 5


def test_deltapond_source_reads_mapped_table(spark, mapped_tbl):
    from athena_delta_lake_spark.sources.deltapond_source import register

    register(spark)
    ds = spark.read.format("deltapond").load(mapped_tbl)
    assert ds.columns == ["id", "payload", "part"]
    assert ds.count() == 10
    native = DeltaTable(spark, mapped_tbl).to_df()
    got = ds.selectExpr("id", "payload.score as s", "part")
    want = native.selectExpr("id", "payload.score as s", "part")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
