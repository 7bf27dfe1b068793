"""Window-function query surface (SURVEY §2.B windows).

Ranking, analytic (lag/lead), running frames, range frames, ntile,
sessionization-by-gap. Every over() clause uses a TOTAL order within its
partition (unique tiebreaker columns) so results are deterministic and
hash-comparable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .base import load, register


@register(
    "w01_topk_per_group",
    "window",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price, rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) t WHERE rn <= 3
    """,
    "top-3 rows per supplier via row_number (the canonical top-k-per-group)",
)
def w01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            "rn",
        )
    )


@register(
    "w02_running_total",
    "window",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
    "per-customer running total over a rows frame",
)
def w02(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "w03_lag_lead_delta",
    "window",
    """
    SELECT user_id, event_id,
           round(value - lag(value) OVER w, 4)  AS delta_prev,
           round(lead(value) OVER w - value, 4) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "lag/lead deltas per user ordered by event time",
)
def w03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 4).alias("delta_next"),
    )


@register(
    "w04_rank_dense_ntile",
    "window",
    """
    SELECT p_brand, p_partkey,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk,
           ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS quartile
    FROM part
    """,
    "rank / dense_rank / ntile per brand",
)
def w04(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w_val = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    w_uniq = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return part.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
        F.ntile(4).over(w_uniq).alias("quartile"),
    )


@register(
    "w05_range_frame_avg",
    "window",
    """
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4)
             AS avg_last_hour
    FROM events
    """,
    "range frame over epoch seconds: trailing 1-hour average per user",
)
def w05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("avg_last_hour"),
    )


@register(
    "w06_first_last_value",
    "window",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "first_value / last_value with explicit full frame",
)
def w06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


@register(
    "w07_sessionize_gap",
    "window",
    """
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    "sessionization by 30-min inactivity gap: lag + cumulative sum of boundaries",
)
def w07(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))


@register(
    "w08_percent_rank_cume",
    "window",
    """
    SELECT c_custkey,
           round(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS pr,
           round(cume_dist()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), 6) AS cd
    FROM customer
    """,
    "distribution window functions: percent_rank + cume_dist per segment",
)
def w08(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "w09_nth_value_frames",
    "window",
    """
    SELECT s_nationkey, s_suppkey,
           nth_value(s_acctbal, 2) OVER
             (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_bal,
           CAST(floor(sum(s_acctbal) OVER
             (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)) AS BIGINT) AS neighbor_sum
    FROM supplier
    """,
    "nth_value over full-partition frame + sliding 3-row sum",
)
def w09(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    near = w.rowsBetween(-1, 1)
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.nth_value("s_acctbal", 2).over(full).alias("second_bal"),
        F.floor(F.sum("s_acctbal").over(near)).cast("long").alias("neighbor_sum"),
    )


@register(
    "w10_gapfill_hourly",
    "timeseries",
    """
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ), axis AS (
      SELECT unnest(range(lo, hi + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS bucket
      FROM b
    ), groups AS (SELECT DISTINCT event_type FROM events),
    per AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(axis.bucket AS TIMESTAMP) AS bucket, groups.event_type,
           coalesce(per.n, 0) AS n
    FROM axis CROSS JOIN groups
    LEFT JOIN per ON per.bucket = axis.bucket AND per.event_type = groups.event_type
    """,
    "gap-filled hourly resample: dense time axis x event_type, zero-filled",
)
def w10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import gapfill_time_buckets

    ev = load(spark, sf_dir, "events")
    return gapfill_time_buckets(ev, "ts", ["event_type"], bucket="1 hour")


@register(
    "w11_funnel_stages",
    "timeseries",
    """
    WITH s0 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id
    )
    SELECT 0 AS stage_idx, 'view' AS stage, (SELECT count(*) FROM s0) AS n_users
    UNION ALL
    SELECT 1, 'click', (SELECT count(*) FROM s1)
    UNION ALL
    SELECT 2, 'purchase', (SELECT count(*) FROM s2)
    """,
    "ordered conversion funnel view -> click -> purchase (strict ts order)",
)
def w11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import funnel

    ev = load(spark, sf_dir, "events")
    return funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@register(
    "w12_grouped_ewma",
    "windows",
    """
    SELECT user_id,
           round(list_reduce(
             list(CAST(floor(value * 1000) AS DOUBLE) ORDER BY ts, event_id),
             (acc, x) -> 0.9 * acc + 0.1 * x), 6) AS ewma,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
    "per-key EWMA (sequential fold per group, parallel across groups) via "
    "applyInPandas; oracle folds the same recurrence with list_reduce",
)
def w12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import grouped_ewma

    ev = load(spark, sf_dir, "events").withColumn(
        "value_millis", F.floor(F.col("value") * 1000).cast("double")
    )
    out = grouped_ewma(
        ev, "user_id", "value_millis", ["ts", "event_id"], alpha=0.1
    )
    return out.select("user_id", F.round("ewma", 6).alias("ewma"), "n")


@register(
    "w13_time_weighted_avg",
    "windows",
    """
    WITH seg AS (
      SELECT user_id,
             floor(value * 1000) AS vm,
             epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_us(ts) AS dt
      FROM events
    )
    SELECT user_id,
           round(sum(vm * dt) / sum(dt), 6) AS twap,
           CAST(count(dt) AS BIGINT) AS n_segments
    FROM seg WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    """,
    "time-weighted average (TWAP) over irregular samples: each value "
    "weighted by its holding interval to the next event",
)
def w13(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.floor(F.col("value") * 1000).alias("vm"),
        (
            # fixture ts is TIMESTAMP_NTZ; session TZ is UTC, so the cast
            # is the same wall-clock instant DuckDB's naive epoch_us sees
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dt"),
    ).filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
    return seg.groupBy("user_id").agg(
        F.round(F.sum(F.col("vm") * F.col("dt")) / F.sum("dt"), 6).alias("twap"),
        F.count("dt").cast("long").alias("n_segments"),
    )
