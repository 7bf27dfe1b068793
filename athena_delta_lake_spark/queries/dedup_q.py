"""Dedup query surface over the `documents` fixture (north-star extension).

Wires operators/dedup.py to the driver correctness gate. Oracle-matched
entries re-express the exact algorithm in DuckDB SQL; MinHash/SimHash use
xxhash64 (not available in DuckDB) so they get rows-only checks, with
recall-vs-exact covered in tests/test_dedup.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from .base import load, register

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# d03 and d04 both start from the same materialized shingle corpus; build it
# once per (session, sf_dir, k) so whichever gate runs first pays for it and
# the other reuses the localCheckpoint. Keyed by applicationId so entries
# from a stopped session are never handed to a new one. shingle_corpus
# checkpoints only the per-doc SETS; the exploded view derives narrowly, so
# the old second checkpoint (re-aggregating exploded back into sets) is gone.
_CORPUS_CACHE: dict[tuple[str, str, int], tuple[DataFrame, DataFrame]] = {}


def _shared_corpus(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> tuple[DataFrame, DataFrame]:
    key = (spark.sparkContext.applicationId, sf_dir, k)
    got = _CORPUS_CACHE.get(key)
    if got is None:
        got = dedup.shingle_corpus(
            load(spark, sf_dir, "documents"), "doc_id", "text", k
        )
        _CORPUS_CACHE.clear()  # one corpus at a time; drop stale sessions
        _CORPUS_CACHE[key] = got
    return got


def _shared_shingles(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    return _shared_corpus(spark, sf_dir, k)[1]


def _shared_sets(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """The verify-side (id, shingle-set) table, materialized once per corpus
    and shared by d03/d04 (both end in exact-Jaccard verification)."""
    return _shared_corpus(spark, sf_dir, k)[0]


@register(
    "d01_exact_dup_stats",
    "dedup",
    f"""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5({_NORM_SQL})) AS n_distinct
    FROM documents GROUP BY source
    """,
    "per-source exact-dup stats via normalized-text md5",
)
def d01(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # precompute the hash column: inside a distinct-aggregate the key
    # expression lands in the Expand operator and is re-evaluated per
    # duplicated row — measured ~5x slower than select-then-agg
    hashed = d.select(
        "source", F.md5(dedup.normalize_text("text")).alias("_h")
    )
    return hashed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_h").alias("n_distinct"),
    )


@register(
    "d02_dedup_keep_first",
    "dedup",
    f"""
    SELECT doc_id FROM (
      SELECT doc_id,
             row_number() OVER (PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
      FROM documents
    ) t WHERE rn = 1
    """,
    "exact dedup keeping lowest doc_id per normalized-text hash",
)
def d02(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "text", "doc_id").select("doc_id")


@register(
    "d03_ngram_jaccard_pairs",
    "dedup",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shingles
      FROM w
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, round(inter / (n_a + n_b - inter), 6) AS jaccard
    FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.6
    """,
    "exact 3-gram Jaccard near-dup pairs via shingle equi-join (no n^2)",
)
def d03(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", k=3, threshold=0.6,
        shingles=_shared_shingles(spark, sf_dir, 3),
        sets=_shared_sets(spark, sf_dir, 3),
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "d04_minhash_lsh_pairs",
    "dedup",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shingles
      FROM w
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, round(inter / (n_a + n_b - inter), 6) AS jaccard
    FROM pairs WHERE inter / (n_a + n_b - inter) >= 0.6
    """,
    "MinHash(64)+LSH(32 bands) candidate pairs, exact-Jaccard verified",
)
def d04(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate operating point: 32 bands x 2 rows. A true pair at jaccard j is
    # missed by every band with prob (1-j^2)^32 <= 1.3e-6 at j=0.6, so at
    # fixture scale LSH recall is exactly 1 and the exact-Jaccard-verified
    # output equals the exhaustive d03 result — hence the shared oracle SQL.
    # (The operator itself stays parameterized; production tunes bands/rows.)
    d = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", k=3, num_hashes=64, bands=32, threshold=0.6,
        shingles=_shared_shingles(spark, sf_dir, 3),
        sets=_shared_sets(spark, sf_dir, 3),
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register(
    "d05_simhash_pairs",
    "dedup",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
    ), h AS (
      SELECT doc_id,
             ('0x' || substr(md5(w), 1, 8))::BIGINT AS hi,
             ('0x' || substr(md5(w), 9, 8))::BIGINT AS lo
      FROM w
    ), bits AS (
      SELECT doc_id, bb.b AS b,
             CASE WHEN bb.b < 32 THEN (lo >> bb.b) & 1
                  ELSE (hi >> (bb.b - 32)) & 1 END AS bit
      FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bb
    ), votes AS (
      SELECT doc_id, b, sum(bit * 2 - 1) AS v FROM bits GROUP BY 1, 2
    ), sb AS (
      SELECT doc_id, b, CASE WHEN v > 0 THEN 1 ELSE 0 END AS sbit FROM votes
    ), ham AS (
      SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
             sum(CASE WHEN a.sbit <> b2.sbit THEN 1 ELSE 0 END) AS hamming
      FROM sb a JOIN sb b2 ON a.b = b2.b AND a.doc_id < b2.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
    FROM ham WHERE hamming <= 3
    """,
    "SimHash64 near-dup pairs (pigeonhole 16-bit blocking, hamming <= 3)",
)
def d05(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gate operating point: max_hamming=3, where the 4-slice pigeonhole
    # blocking is provably exhaustive (3 differing bits cannot touch all 4
    # slices), and md5-derived word hashes so DuckDB reproduces the exact
    # same 64-bit simhash — a full value oracle, not a recall bet.
    d = load(spark, sf_dir, "documents")
    return dedup.simhash_pairs(
        d, "doc_id", "text", max_hamming=3, word_hash="md5"
    )


@register(
    "d06_embedding_neardup",
    "dedup",
    """
    WITH ex AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp,
             sqrt(sum(CAST(a.v AS DOUBLE) * CAST(a.v AS DOUBLE))) AS na,
             sqrt(sum(CAST(b.v AS DOUBLE) * CAST(b.v AS DOUBLE))) AS nb
      FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(dp / (na * nb), 6) AS sim
    FROM pairs WHERE dp / (na * nb) >= 0.45
    """,
    "embedding cosine near-dup pairs (exact, double precision)",
)
def d06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import near_duplicate_pairs_cosine

    e = load(spark, sf_dir, "embeddings")
    pairs = near_duplicate_pairs_cosine(e, "vec_id", "embedding", threshold=0.45, exact=True)
    return pairs.select("id_a", "id_b", F.round("sim", 6).alias("sim"))


@register(
    "d08_incremental_dedup",
    "dedup",
    f"""
    WITH fp AS (
      SELECT doc_id, source, md5({_NORM_SQL}) AS fp FROM documents
    ), corpus AS (
      SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0
    ), survivors AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fp b
        WHERE b.doc_id % 2 = 1
          AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
      ) t WHERE rn = 1
    )
    SELECT source, count(*) AS n_new FROM survivors GROUP BY source
    """,
    "incremental ingest dedup: new batch (odd ids) anti-joined against an "
    "existing fingerprint corpus (even ids), then deduped within the batch",
)
def d08(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = dedup.fingerprint_table(
        d.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    )
    batch = d.filter(F.col("doc_id") % 2 == 1)
    fresh = dedup.incremental_exact_dedup(batch, "doc_id", "text", corpus)
    return fresh.groupBy("source").agg(F.count("*").alias("n_new"))


@register(
    "d07_dup_components",
    "dedup",
    f"""
    WITH RECURSIVE w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shingles
      FROM w
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ), agg AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS inter
      FROM ex a JOIN ex b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ), pairs AS (
      SELECT id_a, id_b FROM agg
      WHERE inter / (n_a + n_b - inter) >= 0.6
    ), und AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach(node, lab) AS (
      SELECT DISTINCT u, u FROM und
      UNION
      SELECT und.u, reach.lab FROM reach JOIN und ON und.v = reach.node
    )
    SELECT component, count(*) AS n_docs FROM (
      SELECT node, min(lab) AS component FROM reach GROUP BY node
    ) t GROUP BY component
    """,
    "near-dup clusters: exact Jaccard pairs -> connected components "
    "(min-label propagation vs a recursive-CTE reachability oracle)",
)
def d07(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.duplicate_clusters(d, "doc_id", "text", k=3, threshold=0.6)


@register(
    "d09_duplicate_spans",
    "dedup",
    """
    WITH w AS (
      SELECT doc_id AS id, w, pos
      FROM (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w,
               generate_subscripts(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1) AS pos
        FROM documents
      )
    ), g AS (
      SELECT id, pos,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win || ' '
               || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win || ' '
               || lead(w, 5) OVER win || ' ' || lead(w, 6) OVER win || ' '
               || lead(w, 7) OVER win AS gram,
             count(*) OVER (PARTITION BY id) AS n_words
      FROM w WINDOW win AS (PARTITION BY id ORDER BY pos)
    ), grams AS (
      SELECT id, gram FROM g WHERE pos <= n_words - 7  -- 1-based start positions
    ), counts AS (
      SELECT gram, count(*) AS c FROM grams GROUP BY 1
    )
    SELECT id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           round(CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_span_frac
    FROM grams JOIN counts USING (gram)
    GROUP BY id
    """,
    "exact duplicated-span stats: fraction of each doc covered by 8-grams "
    "repeated anywhere in the corpus (substring-dedup signal)",
)
def d09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import duplicate_span_stats

    d = load(spark, sf_dir, "documents")
    return duplicate_span_stats(d, "doc_id", "text", k=8)


@register(
    "d10_bloom_incremental_dedup",
    "dedup",
    f"""
    WITH fp AS (
      SELECT doc_id, source, md5({_NORM_SQL}) AS fp FROM documents
    ), corpus AS (
      SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0
    ), survivors AS (
      SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM fp b
        WHERE b.doc_id % 2 = 1
          AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
      ) t WHERE rn = 1
    )
    SELECT source, count(*) AS n_new FROM survivors GROUP BY source
    """,
    "bloom-prefiltered incremental dedup: a broadcastable corpus-size-"
    "independent filter short-circuits definitely-new rows before the "
    "corpus anti-join; no false negatives keeps the result EXACT (== d08)",
)
def d10(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = dedup.fingerprint_table(
        d.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    )
    batch = d.filter(F.col("doc_id") % 2 == 1)
    fresh = dedup.incremental_dedup_bloom(
        batch, "doc_id", "text", corpus, n_bits=1 << 16
    )
    return fresh.groupBy("source").agg(F.count("*").alias("n_new"))


@register(
    "d11_decontamination",
    "dedup",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shingles
      FROM w
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ), bench AS (
      SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0
    ), tr AS (
      SELECT * FROM ex WHERE doc_id % 97 <> 0
    )
    SELECT tr.doc_id AS doc_id,
           count(*) AS n_shared,
           CAST(any_value(tr.n_sh) AS INT) AS n_grams,
           round(count(*) * 1.0 / any_value(tr.n_sh), 6) AS contamination
    FROM tr JOIN bench USING (shingle)
    GROUP BY 1
    """,
    "benchmark decontamination: training docs (id % 97 != 0) sharing 3-gram "
    "shingles with a held-out benchmark slice (id % 97 == 0); bench shingles "
    "broadcast, train side consumed map-side by a broadcast semi-join",
)
def d11(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    full = _shared_shingles(spark, sf_dir, 3)
    stats = dedup.contamination_stats(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
        k=3,
        shingles=full.filter(F.col("id") % 97 != 0),
    )
    return stats.select(
        F.col("id").alias("doc_id"), "n_shared", "n_grams", "contamination"
    )


@register(
    "d12_semantic_dedup",
    "dedup",
    """
    WITH ex AS (
      SELECT vec_id, label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             sum(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dp,
             sqrt(sum(CAST(a.v AS DOUBLE) * CAST(a.v AS DOUBLE))) AS na,
             sqrt(sum(CAST(b.v AS DOUBLE) * CAST(b.v AS DOUBLE))) AS nb
      FROM ex a
      JOIN ex b ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ), dropped AS (
      SELECT DISTINCT id_b FROM pairs WHERE dp / (na * nb) >= 0.3
    )
    SELECT e.vec_id AS id, e.label AS cluster
    FROM embeddings e
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.id_b = e.vec_id)
    """,
    "SemDeDup-style semantic dedup: within-cluster cosine pruning keeping "
    "the lowest id per near-dup set; cluster-keyed self-join bounds work by "
    "cluster size, never the corpus (clusters = the fixture label column "
    "so the check is exact; production path runs spherical k-means)",
)
def d12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup

    e = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding", threshold=0.3, cluster_col="label"
    )


@register(
    "d13_decontamination_bloom",
    "dedup",
    f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                                          i -> array_to_string(words[i:i+2], ' '))) AS shingles
      FROM w
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ), bench AS (
      SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0
    ), tr AS (
      SELECT * FROM ex WHERE doc_id % 97 <> 0
    )
    SELECT tr.doc_id AS doc_id,
           count(*) AS n_shared,
           CAST(any_value(tr.n_sh) AS INT) AS n_grams,
           round(count(*) * 1.0 / any_value(tr.n_sh), 6) AS contamination
    FROM tr JOIN bench USING (shingle)
    GROUP BY 1
    """,
    "Bloom-prefiltered decontamination: a 128KB benchmark-size-independent "
    "filter drops definitely-clean shingles before the exact semi-join; no "
    "false negatives keeps the result EXACT (== d11)",
)
def d13(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    full = _shared_shingles(spark, sf_dir, 3)
    stats = dedup.contamination_stats_bloom(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
        k=3,
        shingles=full.filter(F.col("id") % 97 != 0),
        n_bits=1 << 16,
    )
    return stats.select(
        F.col("id").alias("doc_id"), "n_shared", "n_grams", "contamination"
    )
