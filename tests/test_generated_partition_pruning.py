"""Generated-column partition-filter derivation (round 5): a predicate on
the BASE column of a generated partition column (CAST(ts AS DATE),
to_date, date_trunc, year) derives an exact partition predicate, so the
commonest timestamp-partitioned layout prunes files instead of scanning
every partition — delta-spark's generated-column partition filters."""

from __future__ import annotations

import datetime

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.stats import prune_files


def _gen_table(spark, path, expr, part_type=T.DateType(), part_fn=F.to_date):
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
            T.StructField(
                "p", part_type, metadata={"delta.generationExpression": expr}
            ),
        ]
    )
    base = spark.createDataFrame(
        [
            (f"2024-03-{d:02d} {h:02d}:30:00", d * 100 + h)
            for d in range(1, 6)
            for h in (0, 12)
        ],
        "ts string, v long",
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    df = base.withColumn("p", part_fn("ts"))
    write_delta(spark.createDataFrame(df.collect(), schema), path, partition_by=["p"])
    return DeltaLog(path).snapshot()


def _days(files):
    return sorted({f.partition_values["p"] for f in files})


def test_cast_date_equality_prunes(spark, tmp_path):
    snap = _gen_table(spark, str(tmp_path / "g1"), "CAST(ts AS DATE)")
    assert len(_days(snap.files)) == 5
    pruned = prune_files(snap, [("ts", "=", "2024-03-02 12:30:00")])
    assert _days(pruned) == ["2024-03-02"]


def test_cast_date_range_prunes(spark, tmp_path):
    snap = _gen_table(spark, str(tmp_path / "g2"), "CAST(ts AS DATE)")
    pruned = prune_files(snap, [("ts", ">=", "2024-03-04 06:00:00")])
    assert _days(pruned) == ["2024-03-04", "2024-03-05"]
    # round-9: timestamp DATA stats now compare (session-aware values vs
    # the writer's aware-UTC stats), so the 03-02 file — whose earliest
    # row is 00:30, after the 00:00:01 bound — prunes EXACTLY where the
    # date derivation alone could only be day-conservative
    pruned = prune_files(snap, [("ts", "<", "2024-03-02 00:00:01")])
    assert _days(pruned) == ["2024-03-01"]


def test_range_boundary_is_conservative(spark, tmp_path):
    # boundary semantics on the derived date predicate: `<=` at a file's
    # exact min keeps it; `<` strictly before every row in 03-02 (its
    # earliest is 00:30) prunes it — no matching row exists there
    snap = _gen_table(spark, str(tmp_path / "g3"), "CAST(ts AS DATE)")
    pruned = prune_files(snap, [("ts", "<=", "2024-03-02 00:30:00")])
    assert "2024-03-02" in _days(pruned)
    pruned = prune_files(snap, [("ts", "<", "2024-03-02 00:00:00")])
    assert _days(pruned) == ["2024-03-01"]
    # correctness stays exact through the scan either way
    t = DeltaTable(spark, str(tmp_path / "g3"))
    got = sorted(
        r["v"]
        for r in t.to_df(where="ts < '2024-03-02 00:00:00'").collect()
    )
    assert got == [100, 112]


def test_in_list_derivation(spark, tmp_path):
    snap = _gen_table(spark, str(tmp_path / "g4"), "CAST(ts AS DATE)")
    pruned = prune_files(
        snap,
        [("ts", "in", ["2024-03-01 00:30:00", "2024-03-05 12:30:00"])],
    )
    assert _days(pruned) == ["2024-03-01", "2024-03-05"]


def test_date_trunc_day_timestamp_partition(spark, tmp_path):
    snap = _gen_table(
        spark,
        str(tmp_path / "g5"),
        "date_trunc('DAY', ts)",
        part_type=T.TimestampType(),
        part_fn=lambda c: F.date_trunc("DAY", F.col(c)),
    )
    pruned = prune_files(snap, [("ts", "=", "2024-03-03 12:30:00")])
    assert len(_days(pruned)) == 1 and "2024-03-03" in _days(pruned)[0]


def test_year_partition(spark, tmp_path):
    path = str(tmp_path / "g6")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
            T.StructField(
                "y", T.IntegerType(), metadata={"delta.generationExpression": "year(ts)"}
            ),
        ]
    )
    base = spark.createDataFrame(
        [(f"{y}-06-01 00:00:00", y) for y in (2022, 2023, 2024)],
        "ts string, v long",
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    df = base.withColumn("y", F.year("ts"))
    write_delta(spark.createDataFrame(df.collect(), schema), path, partition_by=["y"])
    snap = DeltaLog(path).snapshot()
    pruned = prune_files(snap, [("ts", ">", "2023-01-01 00:00:00")])
    years = sorted({f.partition_values["y"] for f in pruned})
    assert years == ["2023", "2024"]


def test_results_still_correct_through_scan(spark, tmp_path):
    # end-to-end: pruned scan returns exactly the predicate's rows
    path = str(tmp_path / "g7")
    _gen_table(spark, path, "CAST(ts AS DATE)")
    t = DeltaTable(spark, path)
    df = t.to_df(predicates=[("ts", ">=", "2024-03-04 00:00:00")]).filter(
        "ts >= '2024-03-04 00:00:00'"
    )
    assert sorted(r["v"] for r in df.collect()) == [400, 412, 500, 512]


def test_unsupported_expression_ignored(spark, tmp_path):
    # a non-monotone / unparsed expression derives nothing (no wrong prune)
    path = str(tmp_path / "g8")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
            T.StructField(
                "m",
                T.IntegerType(),
                metadata={"delta.generationExpression": "month(ts)"},
            ),
        ]
    )
    base = spark.createDataFrame(
        [("2023-05-01 00:00:00", 1), ("2024-05-01 00:00:00", 2)],
        "ts string, v long",
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    df = base.withColumn("m", F.month("ts"))
    write_delta(spark.createDataFrame(df.collect(), schema), path, partition_by=["m"])
    snap = DeltaLog(path).snapshot()
    # month() is cyclic, NOT monotone: both rows share m=5, so NOTHING may
    # derive on the partition column (a wrong 'm > 12' would prune both
    # files). The 2023 file still prunes — legitimately, by its own ts
    # DATA stats (max 2023-05-01 < bound), not by any m derivation — and
    # the 2024 file, the only one with matching rows, must survive.
    pruned = prune_files(snap, [("ts", ">", "2023-12-01 00:00:00")])
    assert len(pruned) == 1
    assert (pruned[0].stats or {})["maxValues"]["v"] == 2


# ----------------------- generated-column DML enforcement (round 5)


def _mk_gen(spark, path):
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.LongType()),
            T.StructField(
                "d",
                T.DateType(),
                metadata={"delta.generationExpression": "CAST(ts AS DATE)"},
            ),
        ]
    )
    base = spark.createDataFrame(
        [("2024-03-01 10:00:00", 1), ("2024-03-02 11:00:00", 2)],
        "ts string, v long",
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    df = base.withColumn("d", F.to_date("ts"))
    write_delta(spark.createDataFrame(df.collect(), schema), path, partition_by=["d"])


def test_update_recomputes_generated_column(spark, tmp_path):
    from athena_delta_lake_spark.delta.dml import update, update_mor

    path = str(tmp_path / "upd_gen")
    _mk_gen(spark, path)
    update(spark, path, {"ts": "timestamp'2024-05-09 01:00:00'"}, "v = 1")
    rows = {r["v"]: str(r["d"]) for r in DeltaTable(spark, path).to_df().collect()}
    assert rows[1] == "2024-05-09"  # recomputed AND moved partitions
    assert rows[2] == "2024-03-02"
    update_mor(spark, path, {"ts": "timestamp'2024-06-01 02:00:00'"}, "v = 2")
    rows = {r["v"]: str(r["d"]) for r in DeltaTable(spark, path).to_df().collect()}
    assert rows[2] == "2024-06-01"


def test_update_refuses_generated_column_set(spark, tmp_path):
    from athena_delta_lake_spark.delta.dml import update

    path = str(tmp_path / "upd_gen2")
    _mk_gen(spark, path)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        update(spark, path, {"d": "date'1999-01-01'"}, "v = 1")


def test_merge_rejects_inconsistent_generated_values(spark, tmp_path):
    from athena_delta_lake_spark.delta.dml import merge_upsert

    path = str(tmp_path / "mrg_gen")
    _mk_gen(spark, path)
    bad = spark.createDataFrame(
        [("2024-03-01 10:00:00", 1, "1999-01-01")], "ts string, v long, d string"
    ).select(
        F.to_timestamp("ts").alias("ts"), "v", F.to_date("d").alias("d")
    )
    with pytest.raises(ValueError, match="generated column"):
        merge_upsert(spark, path, bad, ["v"])
    good = spark.createDataFrame(
        [("2024-07-01 10:00:00", 1, "2024-07-01"), ("2024-08-01 00:00:00", 9, "2024-08-01")],
        "ts string, v long, d string",
    ).select(F.to_timestamp("ts").alias("ts"), "v", F.to_date("d").alias("d"))
    merge_upsert(spark, path, good, ["v"])
    rows = {r["v"]: str(r["d"]) for r in DeltaTable(spark, path).to_df().collect()}
    assert rows[1] == "2024-07-01" and rows[9] == "2024-08-01"


def test_update_keeps_pruning_invariant(spark, tmp_path):
    # after the recomputing UPDATE, generated-column pruning still finds
    # the moved rows (the invariant the derivation depends on holds)
    from athena_delta_lake_spark.delta.dml import update

    path = str(tmp_path / "upd_gen3")
    _mk_gen(spark, path)
    update(spark, path, {"ts": "timestamp'2024-05-09 01:00:00'"}, "v = 1")
    snap = DeltaLog(path).snapshot()
    pruned = prune_files(snap, [("ts", "=", "2024-05-09 01:00:00")])
    assert {f.partition_values["d"] for f in pruned} == {"2024-05-09"}


def test_light_prune_df_derives_generated_preds(spark, tmp_path):
    """Round-8 review finding: LightSnapshot.prune_df must apply the same
    generated-partition derivation as both classic prune paths — a
    base-column predicate on a CAST(ts AS DATE)-partitioned table prunes
    to the implied partitions on the light path too."""
    from athena_delta_lake_spark.delta.writer import write_checkpoint

    path = str(tmp_path / "glight")
    snap = _gen_table(spark, path, "CAST(ts AS DATE)")
    write_checkpoint(path)
    DeltaLog.clear_cache()
    light = DeltaLog(path).snapshot_light()
    for preds in (
        [("ts", "=", "2024-03-02 12:30:00")],
        [("ts", ">=", "2024-03-04 06:00:00")],
    ):
        want = sorted(f.path for f in prune_files(snap, preds))
        got = sorted(
            r["path"] for r in light.prune_df(spark, preds).collect()
        )
        assert got == want, preds
    # and through the auto-routed DML candidate selection
    from athena_delta_lake_spark.delta.dml import _light_planning_candidates

    import os

    os.environ["ADLS_LIGHT_PLANNING_FILES"] = "1"
    try:
        out = _light_planning_candidates(
            spark, path, [("ts", "=", "2024-03-02 12:30:00")]
        )
        assert out is not None
        _snap, cands = out
        assert _days(cands) == ["2024-03-02"]
    finally:
        del os.environ["ADLS_LIGHT_PLANNING_FILES"]
