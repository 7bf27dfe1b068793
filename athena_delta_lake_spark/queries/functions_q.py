"""Scalar-function query surface (SURVEY §2.B scalar functions:
string / date-time / math / conditional / JSON / array).

Each query aggregates or filters so the output is small and fully
deterministic; every computed column is aliased identically in Spark and
oracle SQL.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa  # module-level: pandas_udf resolves string type hints
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import load, register


@register(
    "f01_string_funcs",
    "scalar",
    """
    SELECT upper(c_mktsegment) AS seg_upper,
           count(*) AS n,
           min(length(c_name)) AS min_name_len,
           max(length(trim(c_name))) AS max_name_len,
           min(substring(c_name, 1, 8)) AS first_prefix,
           max(concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR))) AS max_tag
    FROM customer
    WHERE c_name LIKE 'Customer%'
    GROUP BY upper(c_mktsegment)
    """,
    "upper/length/trim/substring/concat/LIKE",
)
def f01(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_name").like("Customer%"))
    return c.groupBy(F.upper("c_mktsegment").alias("seg_upper")).agg(
        F.count("*").alias("n"),
        F.min(F.length("c_name")).alias("min_name_len"),
        F.max(F.length(F.trim(F.col("c_name")))).alias("max_name_len"),
        F.min(F.substring("c_name", 1, 8)).alias("first_prefix"),
        F.max(
            F.concat(
                F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
            )
        ).alias("max_tag"),
    )


@register(
    "f02_regex_split",
    "scalar",
    """
    SELECT regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           count(*) AS n,
           CAST(min(len(string_split(p_type, ' '))) AS INT) AS min_words,
           CAST(max(len(string_split(p_type, ' '))) AS INT) AS max_words
    FROM part
    GROUP BY regexp_extract(p_type, '^([A-Z]+)', 1)
    """,
    "regexp_extract + split cardinality",
)
def f02(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.groupBy(
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head")
    ).agg(
        F.count("*").alias("n"),
        F.min(F.size(F.split("p_type", " "))).alias("min_words"),
        F.max(F.size(F.split("p_type", " "))).alias("max_words"),
    )


@register(
    "f03_date_funcs",
    "scalar",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT)    AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           count(*) AS n,
           min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS first_month,
           max(CAST(o_orderdate + INTERVAL 30 DAY AS DATE))    AS max_plus30,
           CAST(min(EXTRACT(dow FROM o_orderdate)) AS INT)     AS min_dow
    FROM orders
    GROUP BY 1, 2
    """,
    "year/quarter/date_trunc/date_add/dayofweek",
)
def f03(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
    ).agg(
        F.count("*").alias("n"),
        F.min(F.date_trunc("month", "o_orderdate").cast("date")).alias("first_month"),
        F.max(F.date_add(F.to_date("o_orderdate"), 30)).alias("max_plus30"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dow: 0=Sunday..6 -> align
        F.min(F.dayofweek("o_orderdate") - 1).alias("min_dow"),
    )


@register(
    "f04_math_funcs",
    "scalar",
    """
    SELECT l_returnflag,
           round(sum(abs(l_extendedprice - l_quantity * 1000)), 2) AS abs_spread,
           round(sum(sqrt(l_quantity)), 4)        AS sum_sqrt,
           round(sum(ln(l_extendedprice)), 4)     AS sum_ln,
           round(sum(pow(l_discount, 2)), 6)      AS sum_disc_sq,
           CAST(sum(floor(l_quantity)) AS BIGINT) AS sum_floor,
           CAST(sum(ceil(l_discount * 10)) AS BIGINT) AS sum_ceil
    FROM lineitem GROUP BY l_returnflag
    """,
    "abs/sqrt/ln/pow/floor/ceil aggregated",
)
def f04(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000)), 2
        ).alias("abs_spread"),
        F.round(F.sum(F.sqrt("l_quantity")), 4).alias("sum_sqrt"),
        F.round(F.sum(F.log("l_extendedprice")), 4).alias("sum_ln"),
        F.round(F.sum(F.pow("l_discount", F.lit(2))), 6).alias("sum_disc_sq"),
        F.sum(F.floor("l_quantity").cast("long")).alias("sum_floor"),
        F.sum(F.ceil(F.col("l_discount") * 10).cast("long")).alias("sum_ceil"),
    )


@register(
    "f05_case_coalesce",
    "scalar",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2
    """,
    "CASE WHEN bucketing + coalesce/nullif normalization",
)
def f05(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
    return o.groupBy(
        bucket.alias("bucket"), status.alias("status_norm")
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))


@register(
    "f06_json_extract",
    "scalar",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
    "JSON field extraction from the events.props payload column",
)
def f06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(F.get_json_object("props", "$.k").isNotNull())
        .groupBy((k % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "f07_array_funcs",
    "scalar",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT CAST(len(words) AS INT) AS n_words,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN list_contains(words, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS with_spark
    FROM t GROUP BY 1
    """,
    "array construction (split), size, contains over documents",
)
def f07(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return (
        d.select(words.alias("words"))
        .groupBy(F.size("words").alias("n_words"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.array_contains("words", "spark"), 1).otherwise(0)
            ).alias("with_spark"),
        )
    )


@register(
    "f11_levenshtein_nullsafe",
    "scalar",
    """
    SELECT least(CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT), 10) AS lev_bucket,
           CAST(sum(CASE WHEN nullif(c_mktsegment, 'MACHINERY')
                              IS NOT DISTINCT FROM nullif(c_mktsegment, 'MACHINERY')
                         THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_n,
           count(*) AS n
    FROM customer
    GROUP BY 1
    """,
    "levenshtein distance buckets + null-safe equality (<=> / IS NOT DISTINCT FROM)",
)
def f11(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return (
        c.groupBy(
            F.least(
                F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("long"),
                F.lit(10).cast("long"),
            ).alias("lev_bucket")
        )
        .agg(
            F.sum(F.when(seg_null.eqNullSafe(seg_null), 1).otherwise(0)).alias(
                "nullsafe_n"
            ),
            F.count("*").alias("n"),
        )
    )


@register(
    "f09_map_funcs",
    "scalar",
    """
    WITH kv AS (
      SELECT o_orderkey, 'status' AS k, o_orderstatus AS v FROM orders
      UNION ALL
      SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v FROM orders
    )
    SELECT k, v, count(*) AS n FROM kv GROUP BY k, v
    """,
    "map construction + explode(map) -> key/value counts",
)
def f09(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return (
        o.select("o_orderkey", F.explode(m).alias("k", "v"))
        .groupBy("k", "v")
        .agg(F.count("*").alias("n"))
    )


@register(
    "f10_from_json_struct",
    "scalar",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod,
           count(*) AS n,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    """,
    "from_json with explicit schema (vs f06's path extraction)",
)
def f10(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(F.from_json("props", "k long").alias("j"))
    return (
        parsed.filter(F.col("j.k").isNotNull())
        .groupBy((F.col("j.k") % 7).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.min("j.k").alias("min_k"))
    )


@register(
    "u01_grouped_map_pandas",
    "udf",
    """
    WITH stats AS (
      SELECT user_id, event_id, value,
             avg(value) OVER (PARTITION BY user_id) AS mu,
             stddev_samp(value) OVER (PARTITION BY user_id) AS sd,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id,
           round(max(CASE WHEN sd > 0 THEN (value - mu) / sd ELSE 0 END), 4) AS max_z,
           CAST(max(n) AS BIGINT) AS n_events
    FROM stats GROUP BY user_id
    """,
    "applyInPandas grouped-map: per-user z-score normalization (Arrow batch "
    "per group), reduced to max |z| per user",
)
def u01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        z = (pdf["value"] - mu) / sd if (sd and sd > 0) else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "z": z.fillna(0.0),
            }
        )

    normalized = ev.groupBy("user_id").applyInPandas(
        zscore, schema="user_id long, event_id long, z double"
    )
    return (
        normalized.groupBy("user_id")
        .agg(
            F.round(F.max("z"), 4).alias("max_z"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "u02_grouped_agg_pandas",
    "udf",
    """
    SELECT event_type,
           round(sum(value * CAST(user_id AS DOUBLE)) / sum(CAST(user_id AS DOUBLE)), 4)
             AS weighted_avg
    FROM events WHERE user_id > 0
    GROUP BY event_type
    """,
    "grouped-agg pandas_udf: numpy weighted average per event type",
)
def u02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        import numpy as np

        wv = w.to_numpy(dtype="float64")
        return float(np.dot(v.to_numpy(dtype="float64"), wv) / wv.sum())

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") > 0)
    return ev.groupBy("event_type").agg(
        F.round(
            weighted_avg(F.col("value"), F.col("user_id").cast("double")), 4
        ).alias("weighted_avg")
    )


@register(
    "u03_udtf_tokens",
    "udf",
    """
    WITH words AS (
      SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
      FROM documents
    )
    SELECT word, count(*) AS n
    FROM words WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
    "Python UDTF (Spark 4 table function): LATERAL tokenizer over documents, "
    "top-20 words — completes the UDF/UDAF/UDTF trio",
)
def u03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string")
    class Tokenize:
        def eval(self, text: str):
            for w in (text or "").lower().split():
                yield (w,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_u03")
    return spark.sql(
        """
        SELECT t.word, count(*) AS n
        FROM docs_u03, LATERAL tokenize_udtf(text) AS t
        GROUP BY t.word ORDER BY n DESC, t.word LIMIT 20
        """
    )


@register(
    "u04_arrow_scalar_udf",
    "udf",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    """,
    "Arrow-native scalar UDF (Spark 4 arrow_udf): pyarrow arrays in/out, "
    "no pandas conversion layer — L2 norm per embedding",
)
def u04(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import arrow_udf

    def _l2(v: pa.Array) -> pa.Array:
        lst = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        # ListArray.values is the FULL child buffer and .offsets are
        # absolute indices into it (correct for sliced arrays; flatten()
        # would rebase and also drop null slots, misaligning everything
        # after the first null) — prefix-sum once, gather per row
        flat = lst.values.to_numpy(zero_copy_only=False).astype("float64")
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype("int64")
        sq = np.concatenate(([0.0], np.cumsum(flat * flat)))
        out = np.sqrt(sq[offs[1:]] - sq[offs[:-1]])
        mask = lst.is_null().to_numpy(zero_copy_only=False)
        return pa.array(out, type=pa.float64(), mask=mask)

    l2_norm = arrow_udf(_l2, "double")

    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(l2_norm(F.col("embedding")), 4).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


@register(
    "f08_higher_order_array",
    "scalar",
    """
    SELECT vec_id,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm_sq,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    """,
    "higher-order array functions transform/filter/aggregate on embeddings",
)
def f08(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    x2 = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(x2, F.lit(0.0), lambda acc, v: acc + v), 4
        ).alias("norm_sq"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "f12_stats_corr_regr",
    "scalar",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
           round(covar_pop(l_quantity, l_discount), 6)       AS covar_p,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "statistical aggregates: corr, covar_samp/pop, regr_slope/intercept/count "
    "— all JVM-side partial-aggregable built-ins (one shuffle)",
)
def f12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(q, p), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(q, p), 4).alias("covar_s"),
        F.round(F.covar_pop(q, d), 6).alias("covar_p"),
        F.round(F.regr_slope(p, q), 4).alias("slope"),
        F.round(F.regr_intercept(p, q), 4).alias("intercept"),
        F.regr_count(p, q).cast("long").alias("n"),
    )


@register(
    "f13_hash_funcs",
    "scalar",
    """
    SELECT c_mktsegment,
           min(md5(c_name)) AS min_md5,
           max(sha256(c_name)) AS max_sha256,
           count(DISTINCT substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2)) AS hash_prefixes
    FROM customer GROUP BY c_mktsegment
    """,
    "cryptographic hash functions: md5 + sha2-256 (engine-identical hex)",
)
def f13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.min(F.md5("c_name")).alias("min_md5"),
        F.max(F.sha2("c_name", 256)).alias("max_sha256"),
        F.countDistinct(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
        ).alias("hash_prefixes"),
    )


@register(
    "f14_bitwise",
    "scalar",
    """
    SELECT o_orderstatus,
           CAST(sum(o_orderkey & 255) AS BIGINT) AS and_sum,
           CAST(sum(o_orderkey | 16) AS BIGINT) AS or_sum,
           CAST(sum(xor(o_orderkey, o_custkey)) AS BIGINT) AS xor_sum,
           CAST(sum(bit_count(CAST(o_orderkey AS BIGINT))) AS BIGINT) AS popcount,
           CAST(sum((o_orderkey % 1024) << 2) AS BIGINT) AS shl_sum,
           CAST(sum(o_orderkey >> 3) AS BIGINT) AS shr_sum
    FROM orders GROUP BY o_orderstatus
    """,
    "bitwise and/or/xor, popcount, shifts",
)
def f14(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.groupBy("o_orderstatus").agg(
        F.sum(k.bitwiseAND(F.lit(255))).cast("long").alias("and_sum"),
        F.sum(k.bitwiseOR(F.lit(16))).cast("long").alias("or_sum"),
        F.sum(k.bitwiseXOR(c)).cast("long").alias("xor_sum"),
        F.sum(F.bit_count(k.cast("long"))).cast("long").alias("popcount"),
        F.sum(F.shiftleft(k % 1024, 2)).cast("long").alias("shl_sum"),
        F.sum(F.shiftright(k, 3)).cast("long").alias("shr_sum"),
    )


@register(
    "f15_variant_json",
    "scalar",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    "VARIANT type: parse_json + typed variant_get extraction (Spark 4 semi-structured path)",
)
def f15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_sum"),
        F.max(k).cast("long").alias("k_max"),
        F.count("*").alias("n"),
    )


@register(
    "f16_try_functions",
    "scalar",
    """
    SELECT o_orderstatus,
           count(try_cast(o_orderpriority AS INTEGER)) AS n_parse_fail_null,
           CAST(sum(try_cast(substring(o_orderpriority, 1, 1) AS INTEGER)) AS BIGINT)
             AS prio_sum,
           CAST(sum(CASE WHEN o_custkey % 3 = 0 THEN NULL
                         ELSE floor(o_totalprice / (o_custkey % 3)) END) AS BIGINT)
             AS div_sum
    FROM orders GROUP BY o_orderstatus
    """,
    "error-safe try_cast / try_divide semantics (NULL, never throw)",
)
def f16(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.expr("try_cast(o_orderpriority AS INT)")).alias("n_parse_fail_null"),
        F.sum(F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)"))
        .cast("long")
        .alias("prio_sum"),
        F.sum(
            F.floor(F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3))
        )
        .cast("long")
        .alias("div_sum"),
    )
