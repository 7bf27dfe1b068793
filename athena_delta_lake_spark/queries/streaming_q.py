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

# events.ts is parquet TIMESTAMP(NANOS): read as long (nanosAsLong) and
# convert to a microsecond timestamp in the stream (lossless; fixture values
# are microsecond-aligned).
_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import file_stream

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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = file_stream(spark, src_dir, _EVENTS_SCHEMA)
    return raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
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
