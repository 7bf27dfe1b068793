"""Relational query surface: scans, filters, joins, aggregation pipelines.

These exercise the operator categories the reference delegated to Athena's
engine (SURVEY §2.B: scans, projection/filter, every join type, aggregation,
sort/limit/top-k, subqueries) as Spark built-ins over the TPC-H-ish fixtures.
Shapes follow the public TPC-H query set where the fixture columns allow.

Scale notes baked into the plans:
- small dims (region/nation/supplier/part) are broadcast explicitly;
- aggregations are expressed groupBy->agg so Catalyst plans partial
  (map-side) aggregation before the shuffle;
- top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  (per-partition heap, no global sort);
- monetary sums are rounded at the END (aggregate then round) so the
  double-precision accumulation matches the oracle bit-for-bit after
  rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register

# --------------------------------------------------------------- q01 TPC-H Q1


@register(
    "q01_pricing_summary",
    "aggregation",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: 2-key groupBy, 8 aggregates, partial agg before shuffle",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ------------------------------------------------------- q02 filter + project


@register(
    "q02_filter_project",
    "scan",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount >= 0.07
      AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    """,
    "projection + conjunctive filter; predicates push to the parquet scan",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 45)
            & (F.col("l_discount") >= 0.07)
            & F.to_date("l_shipdate").between("1995-01-01", "1996-12-31")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue"),
        )
    )


# ------------------------------------------- q02b TPC-H Q2-ish min-cost supplier


@register(
    "q02b_min_cost_supplier",
    "join",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), eligible AS (
      SELECT o.l_partkey, o.unit_cost, s_name, s_acctbal
      FROM offers o
        JOIN supplier ON s_suppkey = o.l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), best AS (
      SELECT *, min(unit_cost) OVER (PARTITION BY l_partkey) AS mc
      FROM eligible
    )
    SELECT p_partkey, p_name, s_name, s_acctbal,
           CAST(floor(unit_cost * 10000) AS BIGINT) AS unit_cost_e4
    FROM best JOIN part ON p_partkey = l_partkey
    WHERE unit_cost = mc AND p_size <= 10
    """,
    "TPC-H Q2-ish: min-cost supplier per part in a region (offers derived "
    "from lineitem; the fixture has no partsupp)",
)
def q02b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)

    # offers: the big-table aggregation shuffles once on (partkey, suppkey)
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # dim chain is tiny: broadcast it to keep the offers side shuffle-free
    asia_supp = supp.join(
        F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal")
    eligible = offers.join(
        F.broadcast(asia_supp), offers.l_suppkey == asia_supp.s_suppkey
    )
    # the TPC-H Q2 correlated "= (SELECT min(...))" as a window min — one
    # extra shuffle on l_partkey instead of a rejoin of the subquery
    best = eligible.withColumn(
        "mc", F.min("unit_cost").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("mc"))
    return best.join(
        F.broadcast(part), part.p_partkey == best.l_partkey
    ).select(
        "p_partkey",
        "p_name",
        "s_name",
        "s_acctbal",
        F.floor(F.col("unit_cost") * 10000).cast("long").alias("unit_cost_e4"),
    )


# ------------------------------------------------- q03 shipping priority-ish


@register(
    "q03_top_orders",
    "join",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3: 3-way join + agg + deterministic top-k (TakeOrderedAndProject)",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1995-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ----------------------------------------------------- q04 semi join (EXISTS)


@register(
    "q04_order_priority",
    "join",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    "EXISTS correlated subquery -> left-semi join",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1995-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1995-04-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ------------------------------------------------- q05 local supplier volume


@register(
    "q05_local_supplier_volume",
    "join",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1994-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
    GROUP BY n_name
    """,
    "TPC-H Q5: 6-way star join; dims broadcast, fact-fact shuffle join",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1994-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------- q06 scalar filter


@register(
    "q06_forecast_revenue",
    "aggregation",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1994-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6: selective scan + global aggregate (no shuffle beyond final)",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1994-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1995-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# -------------------------------------------- q07 volume shipping by nations


@register(
    "q07_volume_shipping",
    "join",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
          OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7: self-joined dim (nation x2), disjunctive pair filter",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2.n_nationkey"))
        .filter(
            (
                (F.col("n1.n_name") == "FRANCE")
                & (F.col("n2.n_name") == "GERMANY")
            )
            | (
                (F.col("n1.n_name") == "GERMANY")
                & (F.col("n2.n_name") == "FRANCE")
            )
        )
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return df.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.round(F.sum("volume"), 2).alias("revenue")
    )


# ---------------------------------------------------- q08 market share-ish


@register(
    "q08_market_share",
    "join",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n_name AS nation
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    ) nations
    GROUP BY o_year
    """,
    "TPC-H Q8-ish: market-share ratio of conditional aggregates per year",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("n_name").alias("nation"),
        )
    )
    return df.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "BRAZIL", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


# ------------------------------------------- q11 value concentration (HAVING)


@register(
    "q11_value_concentration",
    "aggregation",
    """
    SELECT s_nationkey,
           round(sum(s_acctbal), 2) AS nation_bal
    FROM supplier
    GROUP BY s_nationkey
    HAVING sum(s_acctbal) > (SELECT sum(s_acctbal) * 0.05 FROM supplier)
    """,
    "TPC-H Q11-ish: HAVING against an uncorrelated scalar subquery",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    total = supp.agg((F.sum("s_acctbal") * 0.05).alias("_cut"))
    per_nation = supp.groupBy("s_nationkey").agg(
        F.sum("s_acctbal").alias("_bal")
    )
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("_bal") > F.col("_cut"))
        .select(
            "s_nationkey", F.round(F.col("_bal"), 2).alias("nation_bal")
        )
    )


# ------------------------------------------------------- q15 top supplier(s)


@register(
    "q15_top_supplier",
    "join",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "TPC-H Q15: derived revenue view joined against its own max (scalar subquery)",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
    )


# ------------------------------------- q17 small-quantity correlated subquery


@register(
    "q17_small_quantity_revenue",
    "join",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    "TPC-H Q17: correlated scalar subquery (per-part average) -> agg join",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == per_part._pk)
        .filter(F.col("l_quantity") < F.col("_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# -------------------------------------------------- q09 product-type profit


@register(
    "q09_product_profit",
    "join",
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT)
    """,
    "TPC-H Q9-ish: LIKE-filtered dim join, group by (nation, year)",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit")
        )
    )


# ------------------------------------------------------ q10 returned items


@register(
    "q10_returned_items",
    "join",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10: revenue lost to returns, deterministic top-20",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------- q13 customer order-count histogram


@register(
    "q13_customer_distribution",
    "join",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    "TPC-H Q13: left outer join with join-condition filter + double aggregation",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ------------------------------------------------------------ q14 promo share


@register(
    "q14_promo_revenue",
    "join",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-09-01'
      AND CAST(l_shipdate AS DATE) < DATE '1995-10-01'
    """,
    "TPC-H Q14: conditional aggregate ratio over a broadcast join",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1995-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1995-10-01"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


# ------------------------------------------------ q16 anti join + distinct agg


@register(
    "q16_parts_supplier",
    "join",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    "TPC-H Q16-ish: NOT IN -> anti join + count distinct",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 22])
    )
    li = load(spark, sf_dir, "lineitem")
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(
            F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# -------------------------------------------------------- q18 large orders


@register(
    "q18_large_orders",
    "join",
    """
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180
    )
    GROUP BY c_custkey, o_orderkey, CAST(o_orderdate AS DATE), round(o_totalprice, 2)
    """,
    "TPC-H Q18: IN-subquery over HAVING aggregate -> semi join on agg result",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


# ------------------------------------------------- q19 disjunctive predicates


@register(
    "q19_discounted_revenue",
    "join",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    "TPC-H Q19: OR-of-ANDs predicate across join inputs",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# -------------------------------------------- q22 scalar subquery + anti join


@register(
    "q22_global_sales_opportunity",
    "join",
    """
    SELECT c_mktsegment, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    "TPC-H Q22-ish: scalar subquery threshold + NOT EXISTS anti join",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ------------------------------------------------------------ full outer join


@register(
    "j01_full_outer_nation_balance",
    "join",
    """
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           round(COALESCE(c.cust_bal, 0), 2) AS cust_bal,
           round(COALESCE(s.supp_bal, 0), 2) AS supp_bal
    FROM (SELECT c_nationkey AS nk, sum(c_acctbal) AS cust_bal
          FROM customer WHERE c_acctbal > 7000 GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, sum(s_acctbal) AS supp_bal
          FROM supplier WHERE s_acctbal > 7000 GROUP BY s_nationkey) s
    ON c.nk = s.nk
    """,
    "full outer join of two aggregates with COALESCE key recovery",
)
def j01(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum("c_acctbal").alias("cust_bal"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 7000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.sum("s_acctbal").alias("supp_bal"))
    )
    j = cust.join(supp, cust.nk == supp.nk, "full_outer")
    return j.select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"),
        F.round(F.coalesce(F.col("cust_bal"), F.lit(0.0)), 2).alias("cust_bal"),
        F.round(F.coalesce(F.col("supp_bal"), F.lit(0.0)), 2).alias("supp_bal"),
    )


# ------------------------------------------------------------ right outer join


@register(
    "j03_right_outer_orders",
    "join",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    "right outer join preserving order-less customers (count = 0)",
)
def j03(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ------------------------------------------------------------------ cross join


@register(
    "j02_cross_join_small",
    "join",
    """
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    "cross join of small dims (BroadcastNestedLoopJoin)",
)
def j02(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(F.broadcast(r2))
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
    )


# -------------------------------------------------------------- set operators


@register(
    "s01_union_nations",
    "setop",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    """,
    "UNION (distinct) of two projections",
)
def s01(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.union(s).distinct()


@register(
    "s02_intersect_keys",
    "setop",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    "INTERSECT of two key sets",
)
def s02(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    b = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.intersect(b)


@register(
    "s03_except_keys",
    "setop",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    "EXCEPT: customers who never ordered",
)
def s03(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    b = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b).distinct()


@register(
    "s04_multiset_ops",
    "setop",
    """
    WITH li_parts AS (SELECT l_partkey AS k FROM lineitem WHERE l_quantity > 40),
         hot AS (SELECT l_partkey AS k FROM lineitem WHERE l_discount >= 0.09)
    SELECT k, count(*) AS n FROM (
      SELECT k FROM li_parts INTERSECT ALL SELECT k FROM hot
    ) GROUP BY k
    """,
    "multiset INTERSECT ALL: duplicate-preserving set op, multiplicity "
    "verified by the per-key counts",
)
def s04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 40).select(F.col("l_partkey").alias("k"))
    b = li.filter(F.col("l_discount") >= 0.09).select(F.col("l_partkey").alias("k"))
    return a.intersectAll(b).groupBy("k").agg(F.count("*").alias("n"))


# ----------------------------------------------- q12 TPC-H Q12 shape (adapted)


@register(
    "q12_priority_line_counts",
    "join",
    """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
    GROUP BY l_linestatus
    """,
    "TPC-H Q12 shape (fixture lacks shipmode/commit/receipt dates): "
    "fact-fact equi-join + conditional aggregation over the join result",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1995-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ----------------------------------------------- q20 TPC-H Q20 shape (adapted)


@register(
    "q20_part_promotion_suppliers",
    "subquery",
    """
    SELECT s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
        )
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 400
    )
    """,
    "TPC-H Q20 shape (fixture lacks partsupp): nested IN subqueries — "
    "inner semi-join on a LIKE-filtered dim, aggregate + HAVING, outer "
    "semi-join back to supplier. Both semi-joins broadcast the small side.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_keys = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    supp_keys = (
        load(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(part_keys),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(supp_keys),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


# ----------------------------------------------- q21 TPC-H Q21 shape (adapted)


@register(
    "q21_blocking_suppliers",
    "subquery",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    """,
    "TPC-H Q21 shape (returnflag='R' stands in for receipt>commit): "
    "correlated EXISTS (semi self-join with non-equi residual) + "
    "NOT EXISTS (anti self-join) on the fact table, then agg",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    orders_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .join(orders_f, F.col("l1.l_orderkey") == F.col("o_orderkey"))
    )
    supplier = load(spark, sf_dir, "supplier")
    return (
        waiting.join(
            F.broadcast(supplier),
            F.col("l1.l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "j04_lateral_topn",
    "join",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey < 200
    """,
    "correlated LATERAL subquery: top-2 orders per customer",
)
def j04(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("_j04_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_j04_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM _j04_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM _j04_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 200
        """
    )


@register(
    "q23_recursive_cte",
    "relational",
    """
    WITH RECURSIVE ladder(d, n) AS (
      SELECT DATE '2024-01-01' AS d,
             (SELECT count(*) FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-01') AS n
      UNION ALL
      SELECT d + INTERVAL 1 DAY,
             (SELECT count(*) FROM events WHERE CAST(ts AS DATE) = d + INTERVAL 1 DAY)
      FROM ladder WHERE d < DATE '2024-01-10'
    )
    SELECT CAST(d AS DATE) AS d, CAST(n AS BIGINT) AS n FROM ladder
    """,
    "recursive CTE: correlated daily event-count ladder",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("_q23_events")
    return spark.sql(
        """
        WITH RECURSIVE ladder(d, n) AS (
          SELECT DATE '2024-01-01' AS d,
                 (SELECT count(*) FROM _q23_events
                  WHERE CAST(ts AS DATE) = DATE '2024-01-01') AS n
          UNION ALL
          SELECT d + INTERVAL 1 DAY,
                 (SELECT count(*) FROM _q23_events
                  WHERE CAST(ts AS DATE) = d + INTERVAL 1 DAY)
          FROM ladder WHERE d < DATE '2024-01-10'
        )
        SELECT CAST(d AS DATE) AS d, CAST(n AS BIGINT) AS n FROM ladder
        """
    )


@register(
    "m03_skyline_pareto",
    "relational",
    """
    SELECT p_partkey, p_retailprice, p_size FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    "skyline: parts Pareto-optimal on (min price, max size) — two-phase "
    "local+merge operator vs the quadratic NOT EXISTS oracle",
)
def m03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skyline import skyline

    p = load(spark, sf_dir, "part")
    return skyline(
        p.select("p_partkey", "p_retailprice", "p_size"),
        {"p_retailprice": "min", "p_size": "max"},
    )


@register(
    "j05_interval_band_join",
    "joins",
    """
    WITH bands AS (
      SELECT i AS band_id,
             CAST(i * i AS DOUBLE) AS lo,
             CAST((i + 1) * (i + 1) AS DOUBLE) AS hi
      FROM generate_series(0, 22) t(i)
    )
    SELECT b.band_id,
           count(*) AS n,
           CAST(sum(floor(e.value * 1000)) AS BIGINT) AS value_millis
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1
    """,
    "interval-containment join on variable-width value bands via bucketed "
    "equi-join (no BroadcastNestedLoopJoin); oracle is the raw theta join",
)
def j05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import interval_join

    ev = load(spark, sf_dir, "events")
    bands = spark.range(0, 23).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * F.col("id")).cast("double").alias("lo"),
        ((F.col("id") + 1) * (F.col("id") + 1)).cast("double").alias("hi"),
    )
    joined = interval_join(ev, bands, "value", "lo", "hi", bucket_width=25.0)
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 1000)).cast("long").alias("value_millis"),
    )


@register(
    "q24_copurchase_pairs",
    "joins",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT part_a, part_b, n_orders,
             row_number() OVER (ORDER BY n_orders DESC, part_a, part_b) AS rnk
      FROM pairs
    )
    SELECT part_a, part_b, n_orders, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 20
    """,
    "market-basket co-purchase pairs: per-order item self-join, pair "
    "counts, global top-20 (deterministic tiebreak)",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
    )
    # distributed top-k (TakeOrderedAndProject) first; the rank window then
    # runs over 20 rows, not a single global partition of all pairs
    top = pairs.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)
    w = W.orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "part_a", "part_b", "n_orders", "rnk"
    )
