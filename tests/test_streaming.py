"""Structured Streaming semantics the batch oracle can't check
(SURVEY §5.5): watermark late-data drops in append mode, and
dropDuplicatesWithinWatermark state eviction."""

import datetime
import os
import time

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, dir_, rows, n):
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(dir_, f"b{n}"))


def _dt(s):
    return datetime.datetime.fromisoformat(s)


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode tumbling window with a 10-minute watermark: a row arriving
    after its window is closed by the watermark must not change results."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    # batch 0: events in window [10:00, 10:05) and one at 10:30 that will
    # advance the watermark to 10:20 when processed
    _write_batch(
        spark,
        src,
        [
            (1, _dt("2024-01-01 10:01:00"), 1.0),
            (2, _dt("2024-01-01 10:02:00"), 2.0),
            (3, _dt("2024-01-01 10:30:00"), 30.0),
        ],
        0,
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1: a LATE row for the already-closed 10:00 window
        _write_batch(spark, src, [(4, _dt("2024-01-01 10:03:00"), 100.0)], 1)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {
        r["window"]["start"].isoformat(): (r["n"], r["total"])
        for r in spark.table("wm_test").collect()
    }
    # the 10:00 window was emitted when the watermark passed 10:05 and the
    # late row (value=100) was dropped, not merged
    assert rows.get("2024-01-01T10:00:00") == (2, 3.0)


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt2")
    _write_batch(
        spark,
        src,
        [
            (1, _dt("2024-01-01 10:00:00"), 1.0),
            (1, _dt("2024-01-01 10:00:30"), 1.0),  # dup within watermark
            (2, _dt("2024-01-01 10:01:00"), 2.0),
        ],
        0,
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    dedup = stream.withWatermark("ts", "5 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in spark.table("dd_test").collect())
    assert ids == [1, 2]


def test_foreach_batch_delta_sink(spark, tmp_path):
    """Streaming -> Delta append sink via foreachBatch (gives streams the
    native write path)."""
    from athena_delta_lake_spark import DeltaTable, write_delta

    src = str(tmp_path / "src")
    os.makedirs(src)
    tbl = str(tmp_path / "delta_out")
    ckpt = str(tmp_path / "ckpt3")
    _write_batch(
        spark,
        src,
        [(i, _dt("2024-01-01 10:00:00"), float(i)) for i in range(10)],
        0,
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .parquet(os.path.join(src, "*"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, epoch: write_delta(df, tbl, partition_by=[]))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = DeltaTable(spark, tbl).to_df()
    assert out.count() == 10
    assert out.agg(F.sum("value")).collect()[0][0] == sum(range(10))


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key accumulator persists ACROSS
    microbatches (maxFilesPerTrigger=1 forces two separate triggers)."""
    from athena_delta_lake_spark.streaming import running_totals

    src = str(tmp_path / "st_src")
    os.makedirs(src)
    ckpt = str(tmp_path / "st_ckpt")

    df1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, v double"
    )
    df2 = spark.createDataFrame(
        [("a", 3.0), ("c", 7.0)], "k string, v double"
    )
    df1.coalesce(1).write.parquet(os.path.join(src, "b0"))
    df2.coalesce(1).write.parquet(os.path.join(src, "b1"))

    stream = (
        spark.readStream.schema("k string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = (
        running_totals(stream, "k", "v")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("st_totals")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # memory sink in update mode appends every emission; the final state is
    # the row with the highest running count per key (row order in the
    # memory table is not guaranteed)
    rows = spark.table("st_totals").collect()
    last = {}
    for r in rows:
        if r.k not in last or r.n > last[r.k][0]:
            last[r.k] = (r.n, r.total, r.vmin, r.vmax)
    assert last["a"] == (3, 6.0, 1.0, 3.0)  # state carried across batches
    assert last["b"] == (1, 10.0, 10.0, 10.0)
    assert last["c"] == (1, 7.0, 7.0, 7.0)
