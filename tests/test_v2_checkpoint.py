"""V2 (uuid-named) checkpoint layout: manifest + sidecar replay.

The reference's delta-standalone 0.2.0 (/root/reference/build.sbt:37)
predates the v2Checkpoint table feature entirely; modern Delta writers
produce this layout, so the native replayer must consume it — and our
writer can produce it (writer.py:write_checkpoint(v2=True)).
"""

import json
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import cleanup_log, write_checkpoint, write_delta


@pytest.fixture()
def table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id", "id % 4 AS part", "id * 2 AS val")
    write_delta(df, p, partition_by=["part"])
    write_delta(
        spark.range(100, 120).selectExpr("id", "id % 4 AS part", "id * 2 AS val"),
        p,
        mode="append",
    )
    return p


def test_v2_checkpoint_round_trip(spark, table):
    v = write_checkpoint(table, parts=3, v2=True)
    log_dir = os.path.join(table, "_delta_log")
    manifests = [
        f
        for f in os.listdir(log_dir)
        if re.match(r"^\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet$", f)
    ]
    assert len(manifests) == 1
    sidecars = os.listdir(os.path.join(log_dir, "_sidecars"))
    assert len(sidecars) == 3

    # Remove ALL commit JSONs: replay must come from manifest + sidecars.
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    DeltaLog.clear_cache()
    snap = DeltaLog(table).snapshot()
    assert snap.version == v
    assert snap.num_files == sum(1 for _ in snap.files)
    assert sum(f.stats["numRecords"] for f in snap.files) == 120
    assert snap.partition_columns == ["part"]

    from athena_delta_lake_spark.delta.table import DeltaTable

    got = {tuple(r) for r in DeltaTable(spark, table).to_df().collect()}
    want = {(i, i % 4, i * 2) for i in range(120)}
    assert got == want


def test_v2_manifest_preferred_only_when_no_classic(spark, table):
    # Classic + v2 at the same version: either is complete; classic wins
    # (deterministic choice), result identical.
    write_checkpoint(table)
    write_checkpoint(table, v2=True)
    DeltaLog.clear_cache()
    snap = DeltaLog(table).snapshot()
    assert sum(f.stats["numRecords"] for f in snap.files) == 120


def test_latest_version_from_v2_checkpoint_only_log(spark, table):
    # versions: 0-1 the two writes, 2 the v2Checkpoint protocol upgrade the
    # checkpoint commits first; the checkpoint then covers version 2
    write_checkpoint(table, v2=True)
    log_dir = os.path.join(table, "_delta_log")
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[0].isdigit():
            os.remove(os.path.join(log_dir, f))
    DeltaLog.clear_cache()
    assert DeltaLog(table).latest_version() == 2


def test_cleanup_log_keeps_v2_manifest(spark, table):
    write_checkpoint(table, v2=True)
    out = cleanup_log(table, retention_hours=0.0)
    # covered commits = the two writes + the v2Checkpoint protocol upgrade
    assert [os.path.basename(r) for r in out["removed"]] == [
        "00000000000000000000.json",
        "00000000000000000001.json",
    ]
    DeltaLog.clear_cache()
    snap = DeltaLog(table).snapshot()
    assert sum(f.stats["numRecords"] for f in snap.files) == 120


def test_third_party_json_manifest_with_sidecar(spark, tmp_path):
    """Hand-built table in the shape a Databricks-style writer produces:
    JSON v2 manifest + one parquet sidecar, no commit JSONs."""
    root = tmp_path / "ext"
    log_dir = root / "_delta_log"
    sc_dir = log_dir / "_sidecars"
    sc_dir.mkdir(parents=True)

    data = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    pq.write_table(data, root / "part-000.parquet")

    sidecar_schema = pa.schema(
        [
            pa.field(
                "add",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field(
                            "partitionValues", pa.map_(pa.string(), pa.string())
                        ),
                        pa.field("size", pa.int64()),
                        pa.field("modificationTime", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                        pa.field("stats", pa.string()),
                    ]
                ),
            ),
            pa.field(
                "remove",
                pa.struct(
                    [pa.field("path", pa.string()), pa.field("dataChange", pa.bool_())]
                ),
            ),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(
            [
                {
                    "add": {
                        "path": "part-000.parquet",
                        "partitionValues": {},
                        "size": os.path.getsize(root / "part-000.parquet"),
                        "modificationTime": 1700000000000,
                        "dataChange": True,
                        "stats": json.dumps({"numRecords": 3}),
                    },
                    "remove": None,
                }
            ],
            schema=sidecar_schema,
        ),
        sc_dir / "abc.parquet",
    )

    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    manifest_actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint"],
                "writerFeatures": ["v2Checkpoint"],
            }
        },
        {
            "metaData": {
                "id": "ext-1",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {},
            }
        },
        {"checkpointMetadata": {"version": 0}},
        {
            "sidecar": {
                "path": "abc.parquet",
                "sizeInBytes": os.path.getsize(sc_dir / "abc.parquet"),
            }
        },
    ]
    with open(
        log_dir / "00000000000000000000.checkpoint.11111111-2222-3333-4444-555555555555.json",
        "w",
    ) as f:
        for a in manifest_actions:
            f.write(json.dumps(a) + "\n")
    with open(log_dir / "_last_checkpoint", "w") as f:
        json.dump({"version": 0, "size": 4}, f)

    DeltaLog.clear_cache()
    snap = DeltaLog(str(root)).snapshot()
    assert snap.version == 0
    assert [f.path for f in snap.files] == ["part-000.parquet"]

    from athena_delta_lake_spark.delta.table import DeltaTable

    got = sorted(r[0] for r in DeltaTable(spark, str(root)).to_df().collect())
    assert got == [1, 2, 3]
