"""Advanced aggregation surface: rollup/cube/grouping sets, distinct aggs,
approx sketches, pivot/unpivot, exact percentiles (SURVEY §2.B aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register


@register(
    "a01_rollup_revenue",
    "aggregation",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "ROLLUP with GROUPING markers (subtotals + grand total)",
)
def a01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "revenue")
    )


@register(
    "a02_cube_counts",
    "aggregation",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "CUBE over two keys with GROUPING markers",
)
def a02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
    )


@register(
    "a03_grouping_sets",
    "aggregation",
    """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "explicit GROUPING SETS via Spark SQL",
)
def a03(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "a04_multi_distinct",
    "aggregation",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS parts,
           count(DISTINCT l_suppkey) AS supps,
           count(*) AS rows_n
    FROM lineitem GROUP BY l_returnflag
    """,
    "multiple COUNT(DISTINCT) in one aggregate (expand-based plan)",
)
def a04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_suppkey").alias("supps"),
        F.count("*").alias("rows_n"),
    )


@register(
    "k01_approx_distinct",
    "aggregation",
    None,  # HLL++ estimates are engine-specific: rows-only check; the unit
    # test asserts relative error vs exact countDistinct instead.
    "approx_count_distinct (HLL++) per return flag",
)
def a05(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders")
    )


@register(
    "a06_exact_percentiles",
    "aggregation",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
    "exact interpolated percentiles (Spark percentile == DuckDB quantile_cont)",
)
def a06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95"),
    )


@register(
    "a07_pivot",
    "aggregation",
    """
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS O,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    "pivot on l_linestatus (fixed value list -> no extra discovery job)",
)
def a07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "a08_unpivot",
    "aggregation",
    """
    WITH agg AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS qty,
             round(sum(l_extendedprice), 2) AS price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty' AS metric, qty AS val FROM agg
    UNION ALL
    SELECT l_returnflag, 'price' AS metric, price AS val FROM agg
    """,
    "unpivot via stack() of two measure columns",
)
def a08(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
    )
    return agg.select(
        "l_returnflag",
        F.expr("stack(2, 'qty', qty, 'price', price) AS (metric, val)"),
    )


@register(
    "a10_array_agg",
    "aggregation",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           CAST(len(list(DISTINCT l_suppkey)) AS INT) AS n_supp
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "collect_set aggregates (sorted + string-joined for determinism) + set cardinality",
)
def a10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The aggregate is a genuine array<string> collect_set; the gate emits it
    # string-joined so the result set stays scalar-typed (hashable by any
    # pandas-based canonicalizer — array cells break lexsort).
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.size(F.collect_set("l_suppkey")).alias("n_supp"),
    )


@register(
    "a11_min_by_max_by",
    "aggregation",
    """
    SELECT o_orderstatus,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    "min_by/max_by (argmin/argmax) per group",
)
def a11(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@register(
    "a09_having_stats",
    "aggregation",
    """
    SELECT l_suppkey,
           round(avg(l_quantity), 4)    AS avg_qty,
           round(stddev(l_quantity), 4) AS sd_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) >= 20
    """,
    "statistical aggregates (stddev sample) + HAVING",
)
def a09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.stddev("l_quantity"), 4).alias("sd_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") >= 20)
        .drop("_n")
    )


@register(
    "k02_approx_percentile",
    "aggregation",
    None,  # quantile-sketch estimates are engine-specific (Spark GK vs
    # DuckDB t-digest): rows-only check; tests/test_queries_aggregates
    # bounds the error vs the exact percentile instead.
    "approx_percentile (Greenwald-Khanna sketch) p50/p95 per return flag — "
    "the single-pass mergeable-sketch path for 100TB quantiles",
)
def a12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap50"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("ap95"),
    )


@register(
    "a13_mode_listagg",
    "aggregation",
    """
    SELECT o_orderstatus,
           mode(CASE WHEN o_orderkey % 7 < 4 THEN 'hi' ELSE 'lo' END) AS mode_bucket,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS prios,
           count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    "mode (structurally skewed, tie-free) + ordered distinct listagg",
)
def a13(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("_a13_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               mode(CASE WHEN o_orderkey % 7 < 4 THEN 'hi' ELSE 'lo' END) AS mode_bucket,
               listagg(DISTINCT o_orderpriority, '|')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS prios,
               count(*) AS n
        FROM _a13_orders GROUP BY o_orderstatus
        """
    )


@register(
    "k03_hll_sketch_union",
    "aggregation",
    None,  # Datasketches HLL binary sketches have no DuckDB equivalent;
    # estimate-vs-exact error is bounded in tests/test_scale_ops.py
    "mergeable HLL sketches: per-segment hll_sketch_agg -> hll_union_agg "
    "-> estimate (the incremental-distinct pattern: sketches, not rescans)",
)
def a14(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    per_seg = c.groupBy("c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count("*").alias("n"),
    )
    return per_seg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("approx_total_customers"),
        F.sum("n").alias("exact_rows"),
    )


@register(
    "a15_filtered_aggregates",
    "aggregation",
    """
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
           CAST(sum(floor(l_extendedprice)) FILTER (WHERE l_quantity >= 25)
                AS BIGINT) AS big_qty_price,
           CAST(floor(avg(l_tax) FILTER (WHERE l_linestatus = 'F') * 10000 + 0.5) AS BIGINT)
             AS f_tax_x1e4
    FROM lineitem GROUP BY l_returnflag
    """,
    "FILTER-clause aggregates: per-aggregate predicates in one pass",
)
def a15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_disc"),
        F.sum(
            F.when(F.col("l_quantity") >= 25, F.floor("l_extendedprice"))
        )
        .cast("long")
        .alias("big_qty_price"),
        F.floor(
            F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_tax"))) * 10000
            + 0.5
        )
        .cast("long")
        .alias("f_tax_x1e4"),
    )


@register(
    "k04_cms_heavy_hitters",
    "aggregation",
    None,  # xxhash64 cells have no DuckDB equivalent; the CMS guarantee
    # (never undercounts; overcount <= eps*N) is bounded in
    # tests/test_sketches.py, which also proves merge-exactness
    "count-min sketch heavy hitters: relational (d,bucket,cnt) sketch with "
    "map-side-combined cells, candidate keys estimated against it",
)
def a16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches

    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey")
    sk = sketches.cms_build(li, "l_suppkey")
    return sketches.cms_topk(sk, supp, "s_suppkey", k=15)


@register(
    "a17_salted_two_phase_agg",
    "aggregation",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(floor(value * 1000)) AS BIGINT) AS total_millis,
           CAST(max(floor(value * 1000)) AS BIGINT) AS max_millis
    FROM events GROUP BY 1
    """,
    "skew-proof aggregation: explicit salted partial + final combine == the "
    "plain GROUP BY (what AQE can't fix when ONE key dominates a shuffle)",
)
def a17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import two_phase_agg

    ev = load(spark, sf_dir, "events").withColumn(
        "vm", F.floor(F.col("value") * 1000)
    )
    out = two_phase_agg(
        ev,
        ["event_type"],
        {
            "n": (F.count("*"), F.sum("n")),
            "total_millis": (F.sum("vm"), F.sum("total_millis")),
            "max_millis": (F.max("vm"), F.max("max_millis")),
        },
        salt=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("total_millis").cast("long").alias("total_millis"),
        F.col("max_millis").cast("long").alias("max_millis"),
    )
