"""Text-analysis query surface over `documents` (north-star extension).

Language-ID, quality scoring, token counting, fingerprinting — each the
Spark operator from operators/text.py replayed as DuckDB SQL with the
identical formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as tx
from .base import load, register

_WORDS_SQL = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
_TOKEN_RE = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"


@register(
    "x01_token_stats",
    "text",
    f"""
    SELECT source,
           CAST(sum(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT) AS total_tokens,
           CAST(sum(len({_WORDS_SQL})) AS BIGINT) AS total_words,
           CAST(max(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT) AS max_tokens
    FROM documents GROUP BY source
    """,
    "token counting: BPE-ish regex tokens + whitespace words per source",
)
def x01(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(tx.token_count("text").cast("long")).alias("total_tokens"),
        F.sum(F.size(tx.words("text")).cast("long")).alias("total_words"),
        F.max(tx.token_count("text")).cast("long").alias("max_tokens"),
    )


_SW = "', '".join(tx._LANG_MARKERS["en"])


@register(
    "x02_quality_scores",
    "text",
    f"""
    WITH scored AS (
      SELECT lang,
             len({_WORDS_SQL}) AS n_words,
             length(text) AS n_chars,
             length(text) / greatest(len({_WORDS_SQL}), 1) AS mean_wlen,
             len(list_filter({_WORDS_SQL}, w -> list_contains(['{_SW}'], w)))
               / greatest(len({_WORDS_SQL}), 1) AS sw_ratio
      FROM documents
    )
    SELECT lang,
           round(avg(
             (CASE WHEN n_words BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END) +
             (CASE WHEN mean_wlen BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END) +
             (CASE WHEN sw_ratio > 0.01 THEN 0.3 ELSE 0.0 END)), 4) AS avg_quality,
           count(*) AS n
    FROM scored GROUP BY lang
    """,
    "heuristic quality score (length/word-length/stopword bands) by language",
)
def x02(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.avg(tx.quality_score("text")), 4).alias("avg_quality"),
        F.count("*").alias("n"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = "', '".join(tx._LANG_MARKERS[lang])
    return (
        f"len(list_filter({_WORDS_SQL}, w -> list_contains(['{markers}'], w)))"
        f" / greatest(len({_WORDS_SQL}), 1)"
    )


@register(
    "x03_language_id",
    "text",
    f"""
    WITH scored AS (
      SELECT lang AS actual_lang,
             list_aggregate([
               struct_pack(score := {_lang_score_sql('en')}, lang := 'en'),
               struct_pack(score := {_lang_score_sql('es')}, lang := 'es'),
               struct_pack(score := {_lang_score_sql('fr')}, lang := 'fr'),
               struct_pack(score := {_lang_score_sql('de')}, lang := 'de')
             ], 'max') AS best
      FROM documents
    )
    SELECT actual_lang,
           CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS pred_lang,
           count(*) AS n
    FROM scored GROUP BY 1, 2
    """,
    "marker-word language-ID confusion counts (pred vs recorded lang)",
)
def x03(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("actual_lang"),
            tx.predict_language("text").alias("pred_lang"),
        )
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "x04_fingerprint_clusters",
    "text",
    f"""
    SELECT md5(array_to_string(list_sort(list_distinct({_WORDS_SQL})), ' ')) AS fp,
           count(*) AS n_docs,
           min(doc_id) AS first_doc
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
    "order-insensitive word-set fingerprint clustering",
)
def x04(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(tx.fingerprint("text").alias("fp"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "x05_winnow_fingerprints",
    "text",
    """
    WITH f AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> length(x) > 0) AS ws
      FROM documents
    ), h AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(len(ws) - 7, 1) + 1),
               i -> md5(coalesce(array_to_string(ws[i:i+7], ' '), ''))
             ) AS hs
      FROM f
    )
    SELECT doc_id, array_to_string(list_sort(hs)[1:4], ',') AS winnow
    FROM h
    """,
    "winnowing fingerprints (k smallest rolling md5 window hashes per "
    "doc) — engine-portable hash, full oracle; the xxhash64 production "
    "variant's edit-stability is asserted in tests",
)
def x05(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # String-join the fingerprint array so the gate's result set stays
    # scalar-typed (array cells break pandas-based canonicalizers).
    return d.select(
        "doc_id",
        F.array_join(
            tx.winnow_fingerprint("text", window=8, keep=4, hash_fn="md5"),
            ",",
        ).alias("winnow"),
    )


@register(
    "x06_tfidf_top_terms",
    "text",
    """
    WITH words AS (
      SELECT doc_id AS id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
      FROM documents
    ), tf AS (
      SELECT id, term, count(*) AS tf FROM words GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT id, term, tf.tf * ln((SELECT count(*) FROM documents) / dfreq.df) AS score
      FROM tf JOIN dfreq USING (term)
    ), ranked AS (
      SELECT id, term, score,
             row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS rnk
      FROM scored
    )
    SELECT id, rnk, term, round(score, 6) AS score FROM ranked WHERE rnk <= 3
    """,
    "top-3 TF-IDF terms per document (tf * ln(N/df), deterministic tiebreak)",
)
def x06(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(d, "doc_id", "text", top_k=3)


@register(
    "x07_repetition_scores",
    "text",
    """
    WITH w AS (
      SELECT doc_id AS id, w, pos
      FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w,
               generate_subscripts(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1) AS pos
        FROM documents
      )
    ), word_stats AS (
      SELECT id, count(*) AS n_words, count(DISTINCT w) AS n_distinct
      FROM w GROUP BY 1
    ), bg AS (
      SELECT id, w || ' ' || lead(w) OVER (PARTITION BY id ORDER BY pos) AS bg
      FROM w
    ), bg_counts AS (
      SELECT id, bg, count(*) AS cnt FROM bg WHERE bg IS NOT NULL GROUP BY 1, 2
    ), bg_stats AS (
      SELECT id, max(cnt) AS top_bg, sum(cnt) AS n_bg FROM bg_counts GROUP BY 1
    )
    SELECT ws.id, ws.n_words,
           round(1.0 - CAST(ws.n_distinct AS DOUBLE) / ws.n_words, 6) AS dup_word_frac,
           round(coalesce(CAST(bs.top_bg AS DOUBLE) / bs.n_bg, 0.0), 6) AS top_bigram_frac
    FROM word_stats ws LEFT JOIN bg_stats bs USING (id)
    """,
    "Gopher-style repetition quality: duplicate-word and top-bigram fractions per doc",
)
def x07(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return tx.repetition_scores(d, "doc_id", "text")


@register(
    "x08_bigram_lm_score",
    "text",
    f"""
    WITH w AS (
      SELECT doc_id AS id, w1, pos,
             lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w1,
               generate_subscripts(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1) AS pos
        FROM documents
      )
    ), bg AS (
      SELECT id, w1, w2 FROM w WHERE w2 IS NOT NULL
    ), uni AS (
      SELECT w1, count(*) AS c1 FROM bg GROUP BY 1
    ), bi AS (
      SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2
    ), model AS (
      SELECT bi.w1, bi.w2, ln(CAST(c2 AS DOUBLE) / c1) AS logp
      FROM bi JOIN uni USING (w1)
    )
    SELECT id, count(*) AS n_bigrams, round(avg(logp), 6) AS avg_logprob
    FROM bg JOIN model USING (w1, w2)
    GROUP BY id
    """,
    "corpus-trained bigram LM quality score per doc (CCNet-filter shape): "
    "avg ln P(w2|w1), exact in-corpus model",
)
def x08(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return tx.bigram_lm_scores(d, "doc_id", "text")


@register(
    "x09_gopher_rules",
    "text",
    """
    WITH feats AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> length(x) > 0) AS ws,
             string_split(text, chr(10)) AS lines,
             text
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
               / greatest(len(ws), 1) AS mean_wl,
             CAST(len(list_filter(lines, x -> x LIKE '%...')) AS DOUBLE)
               / greatest(len(lines), 1) AS ellipsis_frac,
             CAST(len(list_filter(lines, x -> trim(x) LIKE '-%'
                                           OR trim(x) LIKE '*%')) AS DOUBLE)
               / greatest(len(lines), 1) AS bullet_frac,
             CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
               AS DOUBLE) / greatest(len(ws), 1) AS alpha_frac,
             CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
               / greatest(len(ws), 1) AS hash_ratio,
             (CASE WHEN regexp_matches(lower(text), '\\bthe\\b') THEN 1 ELSE 0 END
            + CASE WHEN regexp_matches(lower(text), '\\bbe\\b') THEN 1 ELSE 0 END
            + CASE WHEN regexp_matches(lower(text), '\\bto\\b') THEN 1 ELSE 0 END
            + CASE WHEN regexp_matches(lower(text), '\\bof\\b') THEN 1 ELSE 0 END
            + CASE WHEN regexp_matches(lower(text), '\\band\\b') THEN 1 ELSE 0 END
            + CASE WHEN regexp_matches(lower(text), '\\bthat\\b') THEN 1 ELSE 0 END
            + CASE WHEN regexp_matches(lower(text), '\\bhave\\b') THEN 1 ELSE 0 END
            + CASE WHEN regexp_matches(lower(text), '\\bwith\\b') THEN 1 ELSE 0 END
             ) AS stop_hits
      FROM feats
    )
    SELECT doc_id,
           (n_words >= 50 AND n_words <= 100000) AS r_word_count,
           (mean_wl >= 3.0 AND mean_wl <= 10.0) AS r_mean_word_len,
           (hash_ratio <= 0.1) AS r_hash_ratio,
           (ellipsis_frac <= 0.3) AS r_ellipsis_lines,
           (bullet_frac <= 0.9) AS r_bullet_lines,
           (alpha_frac >= 0.8) AS r_alpha_words,
           (stop_hits >= 2) AS r_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
            AND hash_ratio <= 0.1 AND ellipsis_frac <= 0.3
            AND bullet_frac <= 0.9 AND alpha_frac >= 0.8
            AND stop_hits >= 2) AS keep
    FROM m
    """,
    "Gopher-style rule-based quality filter (word count / mean word len / "
    "symbol ratio / ellipsis+bullet lines / alphabetic-word fraction / "
    "stopword presence), all codegen built-ins; keep = AND of all rules",
)
def x09(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rules = tx.gopher_rules("text")
    cols = [rules[k].alias(k) for k in sorted(rules)]
    return d.select(
        "doc_id", *cols, tx.gopher_pass("text").alias("keep")
    )


@register(
    "x10_bpe_pair_counts",
    "text",
    f"""
    WITH w AS (
      SELECT unnest({_WORDS_SQL}) AS w FROM documents
    ), p AS (
      SELECT substr(w, i, 2) AS pair
      FROM w, UNNEST(range(1, length(w))) AS t(i)
      WHERE length(w) >= 2
    )
    SELECT pair, count(*) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
    "BPE-trainer first-iteration statistics: top adjacent character "
    "pairs within words (the merge-candidate ranking)",
)
def x10(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return tx.bpe_pair_counts(d, "text", top_n=20)
