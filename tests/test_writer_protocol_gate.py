"""Writer-side protocol gating (Delta spec Writer Requirements): refuse
to write tables demanding writer features this engine does not implement,
and ENFORCE the ones it claims — column invariants from field metadata
(`invariants`, legacy minWriterVersion 2) now reject violating rows like
CHECK constraints do."""

from __future__ import annotations

import json
import os

import pytest

from athena_delta_lake_spark.delta import DeltaLog, DeltaTable, write_delta


def _append_commit(path: str, actions: list[dict]) -> None:
    log_dir = os.path.join(path, "_delta_log")
    v = DeltaLog(path).snapshot().version + 1
    with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    DeltaLog.clear_cache()


@pytest.fixture()
def tbl(spark, tmp_path):
    path = str(tmp_path / "gate_tbl")
    write_delta(
        spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double"),
        path,
    )
    return path


def test_unsupported_writer_feature_blocks_all_writes(spark, tbl):
    # an external writer upgraded the table to a feature we don't implement
    _append_commit(
        tbl,
        [
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE PROTOCOL"}},
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": ["icebergCompatV2", "appendOnly"],
                }
            },
        ],
    )
    df = spark.createDataFrame([(100, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="icebergCompatV2"):
        write_delta(df, tbl)
    with pytest.raises(ValueError, match="icebergCompatV2"):
        DeltaTable(spark, tbl).delete(where="id = 1")
    from athena_delta_lake_spark.delta.writer import set_table_properties

    with pytest.raises(ValueError, match="icebergCompatV2"):
        set_table_properties(tbl, {"foo": "bar"})
    # reading is still fine: no reader feature is involved
    assert DeltaTable(spark, tbl).to_df().count() == 10


def test_future_min_writer_version_blocks(spark, tbl):
    _append_commit(
        tbl,
        [
            {"commitInfo": {"timestamp": 0, "operation": "UPGRADE PROTOCOL"}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 8}},
        ],
    )
    with pytest.raises(ValueError, match="minWriterVersion 8"):
        write_delta(
            spark.createDataFrame([(100, 1.0)], "id long, v double"), tbl
        )


def test_column_invariants_enforced(spark, tbl):
    # external table carrying a column invariant in field metadata
    snap = DeltaLog(tbl).snapshot()
    md = dict(snap.metadata)
    ss = json.loads(md["schemaString"])
    ss["fields"][1]["metadata"] = {
        "delta.invariants": json.dumps(
            {"expression": {"expression": "v >= 0"}}
        )
    }
    md["schemaString"] = json.dumps(ss)
    _append_commit(
        tbl,
        [
            {"commitInfo": {"timestamp": 0, "operation": "SET INVARIANT"}},
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": ["invariants"],
                }
            },
            {"metaData": md},
        ],
    )
    ok = spark.createDataFrame([(100, 5.0)], "id long, v double")
    write_delta(ok, tbl)  # passes the invariant
    bad = spark.createDataFrame([(101, -3.0)], "id long, v double")
    with pytest.raises(ValueError, match="invariant on v"):
        write_delta(bad, tbl)
    # NULL fails an invariant (spec), unlike CHECK where NULL passes
    null_row = spark.createDataFrame([(102, None)], "id long, v double")
    with pytest.raises(ValueError, match="invariant on v"):
        write_delta(null_row, tbl)
    assert DeltaTable(spark, tbl).to_df().count() == 11
