"""Structured Streaming query surface over the `events` fixture
(SURVEY §2.C: the reference has no streaming at all — extension surface).

Each entry runs a REAL streaming query (readStream file source -> windowed
stateful aggregation -> memory sink, driven to completion with
processAllAvailable) and returns the materialized result, so the driver's
correctness gate checks streaming semantics against a batch SQL oracle:

- tumbling windows (complete mode == batch group-by time bucket)
- sliding windows (every event in size/slide buckets)
- streaming dropDuplicates (== batch DISTINCT)

Watermark/late-data semantics (append mode) have no batch oracle by nature;
they are asserted in tests/test_streaming.py instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import file_stream
    from .base import _nano_ts_cols

    # The file-stream source requires a DIRECTORY; the fixture is a single
    # parquet file. Symlink it into a stable per-sf temp dir.
    src_dir = os.path.join(
        "/tmp", f"stream_src_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if not os.path.islink(link) or os.readlink(link) != target:
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(target, link)
    # Follow the fixture's physical timestamp type (mirrors base.load):
    # TIMESTAMP(NANOS) needs the nanosAsLong read + explicit conversion
    # (Spark cannot read nanos natively); micros read as plain timestamps.
    if "ts" in _nano_ts_cols(target):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = file_stream(
            spark,
            src_dir,
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        )
        return raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
        )
    return file_stream(
        spark,
        src_dir,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _run_to_table(stream_df: DataFrame, name: str, mode: str) -> DataFrame:
    from ..streaming import run_to_memory

    return run_to_memory(stream_df, name, mode)


@register(
    "st01_tumbling_window",
    "streaming",
    """
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(floor(value * 1000)) AS BIGINT) AS total_millis
    FROM events GROUP BY 1, 2
    """,
    "streaming tumbling 1h windows, complete mode == batch time buckets",
)
def st01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    # exact integer sum: see st02 note on streaming state merge order
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("total_millis"),
    )
    out = _run_to_table(agg, "st01_out", "complete")
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        "event_type",
        "n",
        "total_millis",
    )


@register(
    "st02_sliding_window",
    "streaming",
    """
    SELECT CAST(floor((epoch(ts) - off) / 3600) * 3600 + off AS BIGINT) AS window_start,
           count(*) AS n,
           CAST(sum(floor(value * 1000)) AS BIGINT) AS total_millis
    FROM events, (VALUES (0), (1800)) offs(off)
    GROUP BY 1
    """,
    "streaming sliding windows (1h size, 30m slide): each event in 2 windows",
)
def st02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    # integer aggregate: streaming state merges in microbatch order, so a
    # float sum diverges from the batch oracle in the last ulp — floor to
    # millis per row, then the bigint sum is order-independent and exact
    agg = ev.groupBy(F.window("ts", "1 hour", "30 minutes")).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("total_millis"),
    )
    out = _run_to_table(agg, "st02_out", "complete")
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        "n",
        "total_millis",
    )


@register(
    "st03_stream_dedup",
    "streaming",
    "SELECT DISTINCT event_id FROM events",
    "streaming dropDuplicates on event_id (state-backed exactly-once ids)",
)
def st03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    dedup = ev.select("event_id").dropDuplicates(["event_id"])
    return _run_to_table(dedup, "st03_out", "append")


@register(
    "st04_session_window",
    "streaming",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, count(*) AS n_events,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start
    FROM sess GROUP BY user_id, session_id
    """,
    "streaming session windows (30m gap) == batch gap sessionization",
)
def st04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    agg = ev.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    out = _run_to_table(agg, "st04_out", "complete")
    return out.select(
        "user_id",
        "n_events",
        F.floor(F.unix_timestamp(F.col("session_window.start"))).alias(
            "session_start"
        ),
    )


@register(
    "st05_stream_static_join",
    "streaming",
    """
    WITH profile AS (
      SELECT user_id, count(*) AS user_n,
             CAST(sum(floor(value * 1000)) AS BIGINT) AS user_millis
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.user_id, p.user_n, p.user_millis
    FROM events e JOIN profile p USING (user_id)
    WHERE e.event_type = 'purchase'
    """,
    "stream-static join: streaming events enriched with a broadcast batch "
    "per-user profile (the dimension-enrichment pattern)",
)
def st05(spark: SparkSession, sf_dir: str) -> DataFrame:
    # static side: batch aggregate, small enough to broadcast — on a cluster
    # this avoids shuffling the unbounded stream side entirely
    profile = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("user_n"),
            F.sum(F.floor(F.col("value") * 1000))
            .cast("long")
            .alias("user_millis"),
        )
    )
    ev = _stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    joined = ev.join(F.broadcast(profile), "user_id").select(
        "event_id", "user_id", "user_n", "user_millis"
    )
    return _run_to_table(joined, "st05_out", "append")


@register(
    "st06_stateful_running_totals",
    "streaming",
    """
    SELECT event_type,
           count(value) AS n,
           CAST(sum(floor(value * 1000)) AS DOUBLE) AS total,
           CAST(min(floor(value * 1000)) AS DOUBLE) AS vmin,
           CAST(max(floor(value * 1000)) AS DOUBLE) AS vmax
    FROM events GROUP BY 1
    """,
    "applyInPandasWithState running per-key totals; final state == batch agg "
    "(values floored to millis so the float sum is order-independent)",
)
def st06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import running_totals

    ev = _stream_events(spark, sf_dir).withColumn(
        "value_millis", F.floor(F.col("value") * 1000).cast("double")
    )
    totals = running_totals(ev, "event_type", "value_millis")
    # update mode: one row per key per microbatch; the memory sink keeps
    # every update, so take the final (max-n) row per key
    out = _run_to_table(totals, "st06_out", "update")
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(F.col("n").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", "n", "total", "vmin", "vmax")
    )


@register(
    "st07_stream_stream_join",
    "streaming",
    """
    SELECT a.event_id AS event_id, b.event_id AS purchase_id,
           a.user_id AS user_id, a.event_type AS event_type
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND b.event_type = 'purchase'
     AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 10 MINUTE
     AND a.event_id <> b.event_id
    """,
    "stream-stream interval join: events attributed to a purchase by the "
    "same user within 10 minutes (watermarked both sides)",
)
def st07(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour").alias("a")
    b = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("b")
    )
    joined = a.join(
        b,
        F.expr(
            "a.user_id = b.user_id"
            " AND b.ts BETWEEN a.ts AND a.ts + interval 10 minutes"
            " AND a.event_id <> b.event_id"
        ),
    ).select(
        F.col("a.event_id").alias("event_id"),
        F.col("b.event_id").alias("purchase_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("event_type"),
    )
    return _run_to_table(joined, "st07_out", "append")


@register(
    "st08_stream_change_feed",
    "streaming",
    """
    SELECT 'insert' AS _change_type, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    UNION ALL
    SELECT 'delete', count(*), CAST(sum(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderstatus = 'P'
    """,
    "streaming change feed (readChangeFeed): labeled inserts + exact "
    "MOR-delete rows aggregated over the full replay",
)
def st08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.deltapond_source import register as register_ds
    from ..streaming import run_to_memory
    from .delta_q import _ensure_cdf_orders

    register_ds(spark)
    path = _ensure_cdf_orders(spark, sf_dir)
    stream = (
        spark.readStream.format("deltapond")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    agg = stream.groupBy("_change_type").agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )
    return run_to_memory(agg, "st08_out", "complete")


@register(
    "st09_stream_upsert_latest",
    "streaming",
    """
    SELECT user_id, event_id AS last_event,
           CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_sec,
           CAST(floor(value * 1000) AS BIGINT) AS value_millis
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    "foreachBatch CDC upsert: per-microbatch conditional MERGE keeps the "
    "newest event per user; final Delta state == batch latest-per-key",
)
def st09(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..delta.table import DeltaTable
    from ..streaming import delta_upsert_sink, file_stream

    work = tempfile.mkdtemp(prefix="st09_")
    src_dir, table, ckpt = (
        os.path.join(work, "src"),
        os.path.join(work, "table"),
        os.path.join(work, "ckpt"),
    )
    # 4 source files -> 4 microbatches (maxFilesPerTrigger=1): the upsert
    # must converge to the same state in ANY arrival order
    load(spark, sf_dir, "events").repartitionByRange(
        4, "event_id"
    ).write.parquet(src_dir)
    stream = file_stream(
        spark,
        src_dir,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    q = delta_upsert_sink(
        stream, table, ckpt, keys=["user_id"], order_by=["ts", "event_id"]
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return DeltaTable(spark, table).to_df().select(
        "user_id",
        F.col("event_id").alias("last_event"),
        F.floor(F.unix_timestamp("ts")).cast("long").alias("last_ts_sec"),
        F.floor(F.col("value") * 1000).cast("long").alias("value_millis"),
    )


@register(
    "b12_stream_tumbling",
    "streaming",
    """
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
           count(*) AS n,
           CAST(sum(floor(value * 1000)) AS BIGINT) AS total_millis
    FROM events WHERE event_id < 500 GROUP BY 1
    """,
    "streaming-family driver-window representative: tumbling 1h windows "
    "over a small event subset (readStream -> stateful agg -> memory "
    "sink, complete mode == batch time buckets), kept cheap so the "
    "driver's alphabetical check window gains its first streaming row",
)
def b12(spark: SparkSession, sf_dir: str) -> DataFrame:
    # small once-per-sf subset dir (file_stream needs a directory; writing
    # through Spark also normalizes the fixture's nano timestamps to micros)
    from .delta_q import _fixture_root

    src_dir = os.path.join(_fixture_root(sf_dir), "stream_small")
    # guard on _SUCCESS (written LAST): a crashed earlier run's partial
    # dir is rewritten, never silently replayed; overwrite is idempotent
    if not os.path.isfile(os.path.join(src_dir, "_SUCCESS")):
        load(spark, sf_dir, "events").filter("event_id < 500").coalesce(
            1
        ).write.mode("overwrite").parquet(src_dir)
    from ..streaming import file_stream

    ev = file_stream(
        spark,
        src_dir,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    agg = ev.groupBy(F.window("ts", "1 hour")).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("total_millis"),
    )
    out = _run_to_table(agg, "b12_out", "complete")
    return out.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        "n",
        "total_millis",
    )
