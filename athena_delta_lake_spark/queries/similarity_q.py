"""Similarity-search query surface over `embeddings` (north-star extension).

Brute-force exact KNN is the oracle-matched baseline; LSH ANN is the scale
path (rows-only here, recall asserted vs brute force in tests). Includes the
as-of join (DuckDB has a native ASOF JOIN to oracle against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim
from ..operators.asof import asof_join
from .base import load, register


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


@register(
    "n01_knn_brute_force",
    "similarity",
    """
    WITH ex AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), sims AS (
      SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             sum(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE))
               / (sqrt(sum(CAST(q.v AS DOUBLE) * CAST(q.v AS DOUBLE)))
                  * sqrt(sum(CAST(c.v AS DOUBLE) * CAST(c.v AS DOUBLE)))) AS sim
      FROM ex q JOIN ex c ON q.pos = c.pos
      WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      FROM sims
    )
    SELECT q_id, vec_id, round(sim, 6) AS sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    "exact cosine top-10 for 3 query vectors (brute force baseline)",
)
def n01(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    corpus = e
    res = sim.brute_force_knn(q, corpus, k=10 + 1)  # +1 then drop self-match
    res = res.filter(F.col("vec_id") != F.col("q_id"))
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        res.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")
    )


# Shared oracle for the ANN gates at their recall-1 operating points: each
# returns top-10 candidates INCLUDING the query's own vector (always rank 1
# at sim=1.0, always a candidate — it collides with itself in every
# bucket/cell), then filters self out, leaving the exact top-9 non-self
# neighbors. Oracle = brute-force non-self ranking cut at 9.
_ANN_TOP9_SQL = """
    WITH ex AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), sims AS (
      SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             sum(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE))
               / (sqrt(sum(CAST(q.v AS DOUBLE) * CAST(q.v AS DOUBLE)))
                  * sqrt(sum(CAST(c.v AS DOUBLE) * CAST(c.v AS DOUBLE)))) AS sim
      FROM ex q JOIN ex c ON q.pos = c.pos
      WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      FROM sims
    )
    SELECT q_id, vec_id, round(sim, 6) AS sim
    FROM ranked WHERE rank <= 9
    """


@register(
    "n02_ann_lsh",
    "similarity",
    _ANN_TOP9_SQL,
    "random-projection LSH ANN (2 planes x 24 tables) with exact re-rank",
)
def n02(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate operating point: 2 planes x 24 tables. At the fixture's nearest-
    # neighbor cosine (~0.35 -> per-plane collision p~0.61) a true neighbor
    # misses every table with prob (1-p^2)^24 ~ 1e-5, so LSH recall is
    # exactly 1 here and the exact re-rank equals brute force (oracle-able).
    # Production trades more planes (smaller buckets) for lower recall.
    e = load(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    res = sim.lsh_ann(q, e, dim=64, k=10, n_planes=2, n_tables=24)
    return res.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", F.round("sim", 6).alias("sim")
    )


@register(
    "n04_ivf_ann",
    "similarity",
    _ANN_TOP9_SQL,
    "IVF ANN: spherical-kmeans cells, full 8-of-8 probe, exact re-rank",
)
def n04(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate operating point: full probe (n_probe == n_clusters), where IVF is
    # exhaustive by construction — every cell's candidates reach the exact
    # re-rank, so output == brute force and the gate is oracle-able while
    # still exercising the centroid training / cell assignment / probe-join
    # machinery. Partial-probe recall is covered in tests/test_scale_ops.py.
    e = load(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    res = sim.ivf_ann(q, e, k=10, n_clusters=8, n_probe=8)
    return res.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", F.round("sim", 6).alias("sim")
    )


@register(
    "n06_pq_ann",
    "similarity",
    _ANN_TOP9_SQL,
    "product-quantization search: 8x16 codebooks, ADC scan over m-byte "
    "codes with quantization-error bounds, bound-filtered exact re-rank",
)
def n06(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full oracle via pq_ann_exact: ADC scores carry +/- residual-norm
    # error bounds, so the candidate cut provably contains the true top-k
    # for ANY codebook quality — recall is 1 by construction, not by
    # parameter luck (the fixture's near-uniform embeddings defeat every
    # fixed k*refine cut; see sim.pq_ann for the conventional refine path,
    # whose recall/reconstruction bounds are asserted in tests/).
    e = load(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    res = sim.pq_ann_exact(q, e, k=10, m=8, k_sub=16)
    return res.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", F.round("sim", 6).alias("sim")
    )


@register(
    "n03_label_centroids",
    "similarity",
    """
    WITH ex AS (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), per_pos AS (
      SELECT label, pos, avg(CAST(v AS DOUBLE)) AS avg_val
      FROM ex GROUP BY 1, 2
    )
    SELECT label,
           round(sqrt(sum(avg_val * avg_val)), 6) AS centroid_norm,
           CAST(count(*) AS INT) AS dim
    FROM per_pos GROUP BY label
    """,
    "IVF-style per-label centroids (posexplode mean), compared by L2 norm",
)
def n03(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cents = sim.label_centroids(e, "label", "embedding")
    return cents.select(
        "label",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("centroid"), lambda x: x * x),
                    F.lit(0.0),
                    lambda a, b: a + b,
                )
            ),
            6,
        ).alias("centroid_norm"),
        F.size("centroid").alias("dim"),
    )


@register(
    "m01_asof_join",
    "similarity",
    """
    SELECT v.event_id,
           v.user_id,
           p.event_id AS purchase_event,
           round(p.value, 4) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
    "as-of join: latest purchase at-or-before each view, per user (window-composed in Spark, native ASOF JOIN in DuckDB)",
)
def m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event"),
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        views,
        purchases,
        on="ts",
        by="user_id",
        right_cols=["purchase_event", "purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "purchase_event",
        F.round("purchase_value", 4).alias("purchase_value"),
    )


@register(
    "m02_binary_meta",
    "similarity",
    """
    SELECT source,
           count(*) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(sha256(text)) AS min_sha
    FROM documents GROUP BY source
    """,
    "multimodal binary-column plumbing: byte length + content hash over binary payloads",
)
def m02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_media_meta

    d = load(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "UTF-8")
    )
    d = attach_media_meta(d, "payload", modality="text", fmt="utf-8")
    return d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("media_meta.n_bytes")).alias("total_bytes"),
        F.min(F.col("media_meta.sha256")).alias("min_sha"),
    )


@register(
    "m04_binary_windows",
    "similarity",
    """
    WITH p AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    ), offs AS (
      SELECT doc_id, payload,
             unnest(range(0, greatest(octet_length(payload), 1), 48)) AS off
      FROM p
    )
    SELECT doc_id,
           CAST(off / 48 AS INT) AS win_id,
           CAST(least(64, octet_length(payload) - off) AS BIGINT) AS win_bytes,
           substr(hex(payload), off * 2 + 1, 128) AS win_hex
    FROM offs
    """,
    "multimodal byte-window sampling (frame-sample shape) via mapInPandas; "
    "deterministic windows hash-matched against a pure-SQL oracle",
)
def m04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import binary_windows

    d = load(spark, sf_dir, "documents").withColumn(
        "payload", F.encode("text", "UTF-8")
    )
    return binary_windows(d, "doc_id", "payload", window_bytes=64, stride_bytes=48)


@register(
    "n05_quantized_cosine",
    "similarity",
    """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS scale
      FROM embeddings
    ), deq AS (
      SELECT vec_id, v,
             list_transform(v, x -> round(x / scale) * scale) AS dq
      FROM q
    ), scored AS (
      SELECT vec_id,
             list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * dq[i]))
               / (sqrt(list_sum(list_transform(v, x -> x * x)))
                  * sqrt(greatest(list_sum(list_transform(dq, x -> x * x)), 1e-30))) AS cos_err
      FROM deq
    )
    SELECT count(*) AS n,
           CAST(floor(min(cos_err) * 1000) AS BIGINT) AS min_cos_x1000,
           CAST(floor(avg(cos_err) * 1000) AS BIGINT) AS avg_cos_x1000
    FROM scored
    """,
    "int8 scalar quantization round trip: cosine(original, dequantized) ~ 1",
)
def n05(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = sim.quantize_embeddings(e, "embedding", "q")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dq = sim.dequantize("q", "q_scale")
    dot = F.aggregate(
        F.zip_with(v, dq, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    nd = F.sqrt(
        F.greatest(
            F.aggregate(dq, F.lit(0.0), lambda acc, x: acc + x * x), F.lit(1e-30)
        )
    )
    scored = q.select((dot / (nv * nd)).alias("cos_err"))
    return scored.agg(
        F.count("*").alias("n"),
        F.floor(F.min("cos_err") * 1000).cast("long").alias("min_cos_x1000"),
        F.floor(F.avg("cos_err") * 1000).cast("long").alias("avg_cos_x1000"),
    )


@register(
    "n07_mips_topk",
    "similarity",
    """
    WITH ex AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), scores AS (
      SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
             sum(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE)) AS score
      FROM ex q JOIN ex c ON q.pos = c.pos
      WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT q_id, vec_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
      FROM scores
    )
    SELECT q_id, vec_id, round(score, 6) AS score, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    "exact max-inner-product top-10 (recommendation ranking; magnitude "
    "matters, cosine is the wrong order)",
)
def n07(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    res = sim.mips_topk(q, e, k=10 + 1)
    res = res.filter(F.col("vec_id") != F.col("q_id"))
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        res.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


@register(
    "n08_grouped_knn",
    "similarity",
    """
    WITH ex AS (
      SELECT vec_id, label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), sims AS (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
             sum(CAST(q.v AS DOUBLE) * CAST(c.v AS DOUBLE))
               / (sqrt(sum(CAST(q.v AS DOUBLE) * CAST(q.v AS DOUBLE)))
                  * sqrt(sum(CAST(c.v AS DOUBLE) * CAST(c.v AS DOUBLE)))) AS sim
      FROM ex q JOIN ex c ON q.pos = c.pos AND q.label = c.label
      WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT q_id, c_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
      FROM sims
    )
    SELECT q_id, c_id, round(sim, 6) AS sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
    "filtered vector search as an equi-join: each query's top-10 ONLY "
    "within its own label group — the constraint is the JOIN KEY (hash "
    "join bounded by group size), not a post-filter on a nested loop",
)
def n08(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), "label", "embedding"
    )
    from pyspark.sql import Window as W

    res = sim.knn_within_group(
        q, e, q_id="qid", c_id="vec_id", vec_col="embedding",
        group_col="label", k=10 + 1,
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        res.filter(F.col("c_id") != F.col("q_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("q_id", "c_id", F.round("sim", 6).alias("sim"), "rank")
    )


@register(
    "n09_semantic_decontamination",
    "similarity",
    """
    WITH ex AS (
      SELECT vec_id, label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), sims AS (
      SELECT c.vec_id, c.label,
             sum(CAST(c.v AS DOUBLE) * CAST(b.v AS DOUBLE))
               / (sqrt(sum(CAST(c.v AS DOUBLE) * CAST(c.v AS DOUBLE)))
                  * sqrt(sum(CAST(b.v AS DOUBLE) * CAST(b.v AS DOUBLE)))) AS sim
      FROM ex c JOIN ex b ON c.pos = b.pos
      WHERE c.label <> 0 AND b.label = 0
      GROUP BY c.vec_id, c.label, b.vec_id
    ), mx AS (
      SELECT vec_id, label, max(sim) AS mxs FROM sims GROUP BY 1, 2
    )
    SELECT label,
           count(*) AS n_corpus,
           count(*) FILTER (WHERE mxs >= 0.42) AS n_contaminated
    FROM mx GROUP BY label
    """,
    "semantic benchmark decontamination: corpus rows within cosine 0.42 "
    "of any benchmark (label=0) embedding, flagged map-side against a "
    "broadcast bench matrix (fixture margin to the threshold >= 1e-4, "
    "asserted in tests, so engine float noise cannot flip a verdict)",
)
def n09(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    bench = e.filter(F.col("label") == 0)
    corpus = e.filter(F.col("label") != 0)
    flagged = sim.semantic_decontamination(corpus, bench, "embedding", tau=0.42)
    return flagged.groupBy("label").agg(
        F.count("*").alias("n_corpus"),
        F.count(F.when(F.col("contaminated"), 1)).alias("n_contaminated"),
    )
