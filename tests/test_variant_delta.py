"""VARIANT columns in native Delta tables (round-4, Delta `variantType`
feature): schema serialization ("variant" type node), protocol stamping
(reader+writer feature, minReaderVersion 3), parquet shredding round
trip, Spark-side numRecords stats (pyarrow 16 cannot open
VARIANT-annotated footers), DML over variant tables."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from athena_delta_lake_spark.delta import DeltaLog, DeltaTable, write_delta


def _variant_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        "id",
        F.parse_json(
            F.format_string('{"k": %d, "tag": "t%d"}', "id", "id")
        ).alias("props"),
    )


@pytest.fixture()
def vt(spark, tmp_path):
    path = str(tmp_path / "variant_tbl")
    write_delta(_variant_df(spark, 0, 10), path)
    return path


def test_variant_protocol_and_schema(spark, vt):
    with open(os.path.join(vt, "_delta_log", f"{0:020d}.json")) as f:
        actions = [json.loads(line) for line in f]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    md = next(a["metaData"] for a in actions if "metaData" in a)
    fields = json.loads(md["schemaString"])["fields"]
    assert {"name": "props", "type": "variant"}.items() <= {
        k: v for k, v in fields[1].items() if k in ("name", "type")
    }.items()


def test_variant_round_trip_and_extraction(spark, vt):
    df = DeltaTable(spark, vt).to_df()
    assert isinstance(df.schema["props"].dataType, T.VariantType)
    got = (
        df.select(
            "id", F.variant_get("props", "$.k", "bigint").alias("k"),
            F.variant_get("props", "$.tag", "string").alias("tag"),
        )
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["k"], r["tag"]) for r in got] == [
        (i, i, f"t{i}") for i in range(10)
    ]


def test_variant_stats_numrecords(spark, vt):
    # Spark-side numRecords path: every add carries stats even though
    # pyarrow cannot open the footer
    snap = DeltaLog(vt).snapshot()
    per_file = [
        (json.loads(f.stats) if isinstance(f.stats, str) else f.stats)[
            "numRecords"
        ]
        for f in snap.files
    ]
    assert sum(per_file) == 10 and all(n > 0 for n in per_file)
    # metadata-only count consumes those stats
    assert DeltaTable(spark, vt).count() == 10


def test_variant_append_and_delete(spark, vt):
    write_delta(_variant_df(spark, 10, 14), vt)
    t = DeltaTable(spark, vt)
    assert t.to_df().count() == 14
    t.delete(where="id >= 12")  # rewrites files containing variant
    out = (
        DeltaTable(spark, vt)
        .to_df()
        .select("id", F.variant_get("props", "$.k", "bigint").alias("k"))
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["k"]) for r in out] == [(i, i) for i in range(12)]


def test_variant_partitioned_and_nested(spark, tmp_path):
    path = str(tmp_path / "variant_part")
    df = spark.range(8).select(
        "id",
        (F.col("id") % 2).cast("int").alias("p"),
        F.struct(
            F.parse_json(F.format_string('{"v": %d}', "id")).alias("inner")
        ).alias("s"),
    )
    write_delta(df, path, partition_by=["p"])
    proto = DeltaLog(path).snapshot().protocol
    assert "variantType" in proto["readerFeatures"]  # nested detection
    got = (
        DeltaTable(spark, path)
        .to_df()
        .select("id", F.variant_get("s.inner", "$.v", "bigint").alias("v"))
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["v"]) for r in got] == [(i, i) for i in range(8)]
