"""Training-data pipeline query surface (north-star extension).

Wires operators/pipeline.py to the driver correctness gate. Every
decision (sample membership, shard id, pack id, chunk boundary, PII
span) is deterministic and re-expressed in DuckDB SQL, so these are all
full value-hash gates — no rows-only entries.

The md5-bucket oracle bridge: Spark `conv(substr(md5(x),1,15),16,10)`
== DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` (value-exact,
60-bit positive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pipeline, text
from .base import load, register

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOK_SQL = r"len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))"


def _bucket_sql(key_sql: str, seed: int, n: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat(CAST({key_sql} AS VARCHAR), "
        f"':{seed}')), 1, 15)) AS BIGINT) % {n}"
    )


@register(
    "p01_pack_sequences",
    "pipeline",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOK_SQL} AS n_tok,
             {_bucket_sql('doc_id', 42, 8)} AS shard
      FROM documents
    ), cum AS (
      SELECT shard, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS before
      FROM tok
    )
    SELECT shard, CAST(floor(before / 2048) AS BIGINT) AS pack,
           count(*) AS n_docs, sum(n_tok) AS tokens_used
    FROM cum GROUP BY 1, 2
    """,
    "sequence packing: shard-local contiguous fill into 2048-token packs",
)
def p01(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return pipeline.pack_sequences(
        d, "doc_id", text.token_count("text"), budget=2048, n_shards=8, seed=42
    )


@register(
    "p02_stratified_sample",
    "pipeline",
    f"""
    SELECT lang, count(*) AS n_sampled, sum(n_chars) AS chars_sampled
    FROM documents
    WHERE (lang = 'en' AND {_bucket_sql('doc_id', 7, 1000000)} < 500000)
       OR (lang = 'es' AND {_bucket_sql('doc_id', 7, 1000000)} < 250000)
       OR (lang = 'fr' AND {_bucket_sql('doc_id', 7, 1000000)} < 250000)
       OR (lang = 'de' AND {_bucket_sql('doc_id', 7, 1000000)} < 100000)
    GROUP BY lang
    """,
    "deterministic per-language stratified sample (replayable md5 buckets)",
)
def p02(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sampled = pipeline.stratified_sample(
        d,
        "doc_id",
        {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.1},
        stratum_col="lang",
        seed=7,
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.sum("n_chars").alias("chars_sampled"),
    )


@register(
    "p03_train_shards",
    "pipeline",
    f"""
    SELECT {_bucket_sql('doc_id', 42, 16)} AS shard,
           count(*) AS n_docs, sum(n_chars) AS total_chars,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM documents GROUP BY 1
    """,
    "deterministic hash shard assignment for data-loader workers",
)
def p03(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return pipeline.assign_shards(d, "doc_id", 16, seed=42).groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


# deterministic PII injection so the fixture text actually contains spans
# to find: every doc gets an email, every 3rd a phone, every 5th an IP
_AUG_SQL = """
    concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com',
           CASE WHEN doc_id % 3 = 0 THEN ' call 555-123-4567' ELSE '' END,
           CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.0.1' ELSE '' END)
"""


def _augment(d: DataFrame) -> DataFrame:
    return d.withColumn(
        "aug",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" call 555-123-4567"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" from 10.0.0.1"))
            .otherwise(F.lit("")),
        ),
    )


@register(
    "p04_pii_redaction",
    "pipeline",
    f"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(aug,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
           len(regexp_extract_all(aug,
               '\\b\\d{{3}}[-. ]\\d{{3}}[-. ]\\d{{4}}\\b')) AS n_phone,
           len(regexp_extract_all(aug,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ipv4,
           length(regexp_replace(regexp_replace(regexp_replace(aug,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
               '\\b\\d{{3}}[-. ]\\d{{3}}[-. ]\\d{{4}}\\b', '<PHONE>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IPV4>', 'g'))
             AS redacted_len
    FROM aug
    """,
    "PII span detection + redaction (email/phone/IPv4, engine-identical regex)",
)
def p04(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _augment(load(spark, sf_dir, "documents"))
    counts = pipeline.pii_counts("aug")
    return d.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        F.length(pipeline.redact_pii("aug")).alias("redacted_len"),
    )


@register(
    "p05_chunk_documents",
    "pipeline",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ), st AS (
      SELECT doc_id, words,
             unnest(range(1, greatest(len(words), 1) + 1, 48)) AS start
      FROM w
    )
    SELECT doc_id AS id, CAST((start - 1) / 48 AS BIGINT) AS chunk_id,
           len(words[start:start + 63]) AS n_chunk_tokens,
           md5(array_to_string(words[start:start + 63], ' ')) AS chunk_hash
    FROM st
    """,
    "overlapping word-window chunking (size 64, stride 48)",
)
def p05(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chunks = pipeline.chunk_documents(d, "doc_id", "text", chunk_size=64, stride=48)
    return chunks.select(
        "id",
        F.col("chunk_id").cast("long"),
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_hash"),
    )


@register(
    "p06_mixture_sample",
    "pipeline",
    f"""
    WITH counts AS (
      SELECT source, count(*) AS n,
             CAST(floor(sqrt(count(*))) AS BIGINT) AS w
      FROM documents GROUP BY source
    ), tot AS (
      SELECT sum(n) AS total, sum(w) AS wsum FROM counts
    ), kept AS (
      SELECT d.source
      FROM documents d JOIN counts c ON d.source = c.source, tot t
      WHERE CAST({_bucket_sql('d.doc_id', 42, 1_000_000)} AS HUGEINT)
              * CAST(c.n AS HUGEINT) * CAST(t.wsum AS HUGEINT)
          < CAST(1000000 AS HUGEINT)
              * CAST(floor(0.2 * t.total) AS HUGEINT) * CAST(c.w AS HUGEINT)
    )
    SELECT source, count(*) AS n_kept FROM kept GROUP BY source
    """,
    "temperature (alpha=0.5) mixture sample at 20%: per-source rates "
    "proportional to sqrt(n)/n via exact integer cross-multiplication — "
    "byte-replayable in any engine",
)
def p06(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept = pipeline.mixture_sample(d, "doc_id", "source", frac=0.2, seed=42)
    return kept.groupBy("source").agg(F.count("*").alias("n_kept"))


@register(
    "p07_epoch_shuffle",
    "pipeline",
    """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42:0'), doc_id) AS BIGINT) - 1 AS pos_e0,
           CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42:1'), doc_id) AS BIGINT) - 1 AS pos_e1
    FROM documents
    """,
    "deterministic per-epoch corpus shuffle: bucketed two-phase dense rank "
    "== the naive global-window oracle, different permutation per epoch",
)
def p07(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Chain epoch 1 over epoch 0's output instead of self-joining two
    # independent shuffles on doc_id: epoch_shuffle only APPENDS a column,
    # so composition computes both permutations in one pass — the old
    # SortMergeJoin (two extra sort exchanges over the corpus) is gone and
    # each epoch's position values are unchanged (round-11 optimization).
    d = load(spark, sf_dir, "documents").select("doc_id")
    e0 = pipeline.epoch_shuffle(d, "doc_id", epoch=0).withColumnRenamed(
        "epoch_pos", "pos_e0"
    )
    both = pipeline.epoch_shuffle(e0, "doc_id", epoch=1).withColumnRenamed(
        "epoch_pos", "pos_e1"
    )
    return both.select("doc_id", "pos_e0", "pos_e1")


_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(text,"
    " '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),"
    " '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g'),"
    " '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g')"
)


@register(
    "p08_clean_pipeline",
    "pipeline",
    f"""
    WITH redacted AS (
      SELECT doc_id, source, {_REDACT_SQL} AS clean FROM documents
    ), scored AS (
      SELECT doc_id, source, clean,
             len(string_split(trim(regexp_replace(lower(clean), '\\s+', ' ', 'g')), ' ')) AS n_words
      FROM redacted
    ), kept AS (
      SELECT * FROM scored WHERE n_words BETWEEN 10 AND 1000
    ), deduped AS (
      SELECT doc_id, source, n_words FROM (
        SELECT doc_id, source, n_words,
               row_number() OVER (
                 PARTITION BY md5(trim(regexp_replace(lower(clean), '\\s+', ' ', 'g')))
                 ORDER BY doc_id) AS rn
        FROM kept
      ) t WHERE rn = 1
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words
    FROM deduped GROUP BY source
    """,
    "capstone cleanup pipeline: PII redaction -> length gate -> exact "
    "dedup keep-first -> per-source counts (one composed narrow+shuffle "
    "flow, every stage oracle-replayed)",
)
def p08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup, normalize_text

    d = load(spark, sf_dir, "documents").withColumn(
        "clean", pipeline.redact_pii("text")
    )
    scored = d.withColumn(
        "n_words", F.size(F.split(normalize_text("clean"), " "))
    )
    kept = scored.filter(F.col("n_words").between(10, 1000))
    deduped = exact_dedup(kept, "clean", "doc_id")
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
    )


@register(
    "p09_domain_quota",
    "pipeline",
    """
    SELECT doc_id, source, CAST(quota_rank AS INT) AS quota_rank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS quota_rank
      FROM documents
    ) t WHERE quota_rank <= 20
    """,
    "per-domain quota cap (quota_per_group): keep each source's 20 best "
    "docs via salted two-phase top-n — identical output to the naive "
    "single-window form the oracle runs, but every window partition is "
    "bounded by n*n_salts instead of domain size",
)
def p09(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    capped = pipeline.quota_per_group(
        d, group_col="source", order_col="n_chars", n=20, id_col="doc_id"
    )
    return capped.select(
        "doc_id", "source", F.col("quota_rank").cast("int").alias("quota_rank")
    )


@register(
    "p10_lm_filter_capstone",
    "pipeline",
    """
    WITH w AS (
      SELECT doc_id AS id, w1, pos,
             lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w1,
               generate_subscripts(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1) AS pos
        FROM documents
      )
    ), bg AS (SELECT id, w1, w2 FROM w WHERE w2 IS NOT NULL),
    uni AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
    bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
    model AS (
      SELECT bi.w1, bi.w2, ln(CAST(c2 AS DOUBLE) / c1) AS logp
      FROM bi JOIN uni USING (w1)
    ), scored AS (
      SELECT id, count(*) AS n_bigrams, avg(logp) AS s
      FROM bg JOIN model USING (w1, w2) GROUP BY id
    ), kept AS (
      SELECT d.doc_id, d.source, sc.n_bigrams
      FROM documents d JOIN scored sc ON d.doc_id = sc.id
      WHERE round(sc.s, 6) > -3.5 AND sc.n_bigrams >= 40
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams
    FROM kept GROUP BY source
    """,
    "model-based quality-filter capstone (CCNet shape): corpus bigram LM "
    "score per doc -> drop low-likelihood and short docs -> per-source "
    "survival stats; composes x08's LM with the filter+aggregate stages",
)
def p10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_lm_scores

    d = load(spark, sf_dir, "documents")
    scored = bigram_lm_scores(d, "doc_id", "text")
    kept = (
        d.join(scored, d.doc_id == scored.id)
        .filter((F.col("avg_logprob") > -3.5) & (F.col("n_bigrams") >= 40))
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("total_bigrams"),
    )


@register(
    "p11_leakage_safe_split",
    "pipeline",
    f"""
    WITH fp AS (
      SELECT doc_id, n_chars, md5({_NORM_SQL}) AS fp FROM documents
    ), grp AS (
      SELECT doc_id, n_chars, min(doc_id) OVER (PARTITION BY fp) AS rep
      FROM fp
    ), b AS (
      SELECT n_chars, rep, {_bucket_sql('rep', 13, 1000000)} AS bkt FROM grp
    )
    SELECT CASE WHEN bkt < 900000 THEN 'train'
                WHEN bkt < 950000 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           count(DISTINCT rep) AS n_clusters,
           sum(n_chars) AS total_chars
    FROM b GROUP BY 1
    """,
    "leakage-safe train/val/test split: exact-dup clusters assigned "
    "whole (hash of the cluster representative), so no near-duplicate "
    "straddles the train/eval boundary",
)
def p11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators import dedup

    d = load(spark, sf_dir, "documents")
    rep = d.withColumn(
        "_fp", F.md5(dedup.normalize_text("text"))
    ).withColumn("rep", F.min("doc_id").over(W.partitionBy("_fp")))
    split = pipeline.leakage_safe_split(
        rep, "rep", {"train": 0.9, "val": 0.05, "test": 0.05}, seed=13
    )
    return split.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("rep").alias("n_clusters"),
        F.sum("n_chars").alias("total_chars"),
    )
