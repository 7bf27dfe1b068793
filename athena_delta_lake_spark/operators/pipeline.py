"""Training-data pipeline operators: deterministic sampling, shard
assignment, sequence packing, PII redaction, and document chunking.

These are the batch-ETL stages between a raw document corpus and a
training run. Design rules:

- **Deterministic everywhere.** Sampling/sharding decisions derive from
  md5 of (key, seed) — never `rand()` — so a pipeline re-run (or a
  backfill on 100 TB) selects byte-identical rows, and the DuckDB oracle
  can replay every decision (`conv(substr(md5(x),1,15),16,10)` in Spark
  equals `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` in DuckDB —
  verified value-exact).
- **No shuffles in per-row stages.** Sampling, sharding, redaction, and
  chunking are narrow transforms; only packing aggregates (a single
  window over the shard) and downstream group-bys shuffle.
- **Shard-local packing.** Global greedy bin packing is inherently
  sequential; the scalable formulation packs WITHIN hash-assigned shards
  (each shard ~ corpus/n_shards docs), which is how multi-host training
  data is laid out anyway — one shard per data-loader worker.

The reference connector has no pipeline surface at all (it is a read-only
scan connector, DeltaRecordHandler.scala:116-155); this module is part of
the north-star extension surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_BUCKET_DENOM = 1_000_000

# PII patterns, RE2-and-Java-regex compatible (no lookaround/backrefs) so
# Spark and the DuckDB oracle match byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def md5_bucket(col: str | Column, seed: int, n: int) -> Column:
    """Deterministic uniform bucket in [0, n) from md5(col || ':' || seed).

    15 hex digits = 60 bits, always positive in a long; identical in any
    engine with md5 + hex parsing (the oracle bridge).
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.substring(F.md5(F.concat(c.cast("string"), F.lit(f":{seed}"))), 1, 15)
    return (F.conv(h, 16, 10).cast("long") % n).alias("bucket")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | float,
    stratum_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its md5 bucket falls
    below fraction * 1e6. With `fractions` a dict, each stratum gets its
    own rate (rows in unlisted strata are dropped). Unlike df.sample(),
    re-runs and engine ports select the same rows."""
    b = md5_bucket(key_col, seed, _BUCKET_DENOM)
    if isinstance(fractions, dict):
        if stratum_col is None:
            raise ValueError("stratum_col required with per-stratum fractions")
        cond = None
        for stratum, frac in fractions.items():
            this = (F.col(stratum_col) == stratum) & (
                b < int(frac * _BUCKET_DENOM)
            )
            cond = this if cond is None else cond | this
        return df.filter(cond)
    return df.filter(b < int(fractions * _BUCKET_DENOM))


def assign_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 42
) -> DataFrame:
    """Add a deterministic `shard` column in [0, n_shards). Hash-uniform:
    shards stay balanced at any scale with no shuffle (narrow transform;
    the training job later repartitions BY shard exactly once)."""
    return df.withColumn("shard", md5_bucket(key_col, seed, n_shards))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int,
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Pack documents into fixed token-budget groups (sequence packing).

    Within each hash-assigned shard, docs are taken in id order and laid
    contiguously; doc i lands in pack floor(cum_tokens_before_i / budget).
    Contiguous-fill packing (vs per-pack greedy refusal) is one window
    cumsum — embarrassingly parallel per shard and oracle-replayable.
    Docs longer than `budget` still get a pack (they span it; the trainer
    truncates). Returns one row per (shard, pack) with n_docs and
    tokens_used.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    sharded = assign_shards(df, id_col, n_shards, seed).withColumn("_tok", t)
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = sharded.withColumn(
        "pack",
        F.floor((F.sum("_tok").over(w) - F.col("_tok")) / budget).cast("long"),
    )
    return packed.groupBy("shard", "pack").agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").alias("tokens_used"),
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    frac: float,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted mixture sample (alpha = 0.5): draw ~frac of the
    corpus with per-source rates proportional to sqrt(n_s)/n_s, so
    over-represented sources are down-weighted and small sources up-weighted
    — the standard multilingual/LM corpus-rebalancing scheme (temperature
    T=2 sampling, p_s ∝ n_s^(1/2)).

    Deterministic AND engine-replayable: a row is kept iff

        bucket(key) * n_s * W  <  1_000_000 * T_target * w_s

    where w_s = floor(sqrt(n_s)) (integer weights), W = sum of w_s,
    T_target = floor(frac * N). The comparison is exact integer arithmetic
    (decimal(38,0) here, HUGEINT in the DuckDB oracle) — no float rate ever
    crosses an engine boundary, so re-runs and engine ports keep byte-
    identical rows. sqrt on integer-valued doubles is correctly rounded per
    IEEE-754, so floor(sqrt(n_s)) is engine-stable too. Exactness holds
    while 1e6 * n_s * W < 10^38 — i.e. any real corpus.

    Per-source rates are capped at 1 implicitly (bucket < 1e6 always holds
    when the RHS exceeds 1e6 * n_s * W). One broadcast join of the tiny
    per-source count relation onto the corpus; the scan stays narrow.
    """
    dec = "decimal(38,0)"
    counts = (
        df.groupBy(F.col(source_col).alias("_src"))
        .agg(F.count("*").alias("_n"))
        .withColumn("_w", F.floor(F.sqrt(F.col("_n"))).cast("long"))
    )
    totals = counts.agg(
        F.sum("_n").alias("_total"), F.sum("_w").alias("_wsum")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "_src",
        (F.col("_n").cast(dec) * F.col("_wsum").cast(dec)).alias("_lhs_scale"),
        (
            F.lit(_BUCKET_DENOM).cast(dec)
            * F.floor(F.lit(frac) * F.col("_total")).cast(dec)
            * F.col("_w").cast(dec)
        ).alias("_rhs"),
    )
    b = md5_bucket(key_col, seed, _BUCKET_DENOM)
    return (
        df.join(
            F.broadcast(rates),
            df[source_col] == rates["_src"],
        )
        .filter(b.cast(dec) * F.col("_lhs_scale") < F.col("_rhs"))
        .drop("_src", "_lhs_scale", "_rhs")
    )


def redact_pii(col: str | Column) -> Column:
    """Text with email/phone/IPv4 spans replaced by <TYPE> tags."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-type match counts (size of regexp_extract_all — the formulation
    DuckDB shares, unlike regexp_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat in PII_PATTERNS.items()
    }


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each doc into overlapping word-window chunks.

    Chunk c covers words [1 + c*stride, 1 + c*stride + chunk_size); with
    stride < chunk_size consecutive chunks overlap by chunk_size - stride
    words (context continuity for training). Narrow transform: explode of
    a per-row start-position sequence, no shuffle. Returns
    (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    from .dedup import normalize_text

    words = F.split(normalize_text(text_col), " ")
    n = F.size(words)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    ex = df.select(
        F.col(id_col).alias("id"),
        words.alias("_w"),
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    chunk = F.slice(F.col("_w"), F.col("start"), chunk_size)
    return ex.select(
        "id",
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    seed: int = 42,
    prefix_hex: int = 2,
) -> DataFrame:
    """Deterministic per-epoch global shuffle: every epoch is a different
    (but replayable) permutation of the corpus — the data-loader ordering
    primitive. Position = dense 0-based rank of md5(key:seed:epoch).

    A naive global `row_number() OVER (ORDER BY hash)` funnels 100 TB
    through ONE partition. This computes the same dense position in two
    scalable steps: rows range-bucket by the hash's first `prefix_hex`
    hex digits (256 uniform buckets by construction — md5 is the
    balancer), per-bucket counts (a tiny aggregate) turn into cumulative
    offsets via a 256-row window and broadcast back, and each bucket
    ranks locally; global position = bucket offset + local rank. Two
    narrow shuffles, no single-partition stage over DATA (the offset
    cumsum window runs over at most 16^prefix_hex count rows), identical
    output to the naive form (the oracle runs the naive form).

    Round-11 optimization: the offsets used to be a driver collect() +
    createDataFrame round trip — a separate Spark job per call that
    serialized the whole pipeline behind it. They are now a plan branch
    (groupBy + cumulative-sum window + broadcast join), so one action
    executes everything and the scan side can overlap the count side.
    Buckets absent from the data contribute zero to every later offset,
    so the cumsum over PRESENT buckets equals the old dense-range fold.

    Returns df + (epoch_pos long). Keys must be unique (corpus ids).
    """
    hx = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}:{epoch}"))
    )
    bucket = F.conv(F.substring(hx, 1, prefix_hex), 16, 10).cast("int")
    with_h = df.withColumn("_h", hx).withColumn("_b", bucket)

    w_off = W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
    off_df = (
        with_h.groupBy("_b")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("long"),
        )
        .select("_b", "_off")
    )
    w = W.partitionBy("_b").orderBy("_h", key_col)
    return (
        with_h.join(F.broadcast(off_df), "_b")
        .withColumn(
            "epoch_pos", F.row_number().over(w).cast("long") - 1 + F.col("_off")
        )
        .drop("_h", "_b", "_off")
    )


def quota_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
    id_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Cap each group at its `n` best rows (ORDER BY order_col DESC,
    id_col) — the per-domain quota step of corpus curation ("at most N
    docs per domain, keep the highest-quality ones").

    A single `row_number() OVER (PARTITION BY group)` puts an entire
    domain in one window partition; at 100 TB a hot domain (think
    wikipedia.org or a crawler trap) is billions of rows through one
    task. Two phases bound every window partition instead: rows salt
    into `n_salts` deterministic buckets per group (hash of the id), each
    (group, salt) bucket keeps its local top-n, and the final top-n per
    group ranks only the <= n * n_salts survivors. Output is identical
    to the naive single-window form (the oracle runs the naive form) —
    any row in the true top-n is in the top-n of its own bucket.
    """
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    order = [F.desc(order_col), F.asc(id_col)]
    w1 = W.partitionBy(group_col, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n)
        .drop("_r1", "_salt")
    )
    w2 = W.partitionBy(group_col).orderBy(*order)
    return (
        survivors.withColumn("quota_rank", F.row_number().over(w2))
        .filter(F.col("quota_rank") <= n)
    )


def leakage_safe_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Group-aware train/val/test assignment: the split is a
    deterministic md5 bucket of the GROUP key, so every member of a
    group — a near-dup cluster, a source domain, a user — lands in the
    SAME split. Splitting i.i.d. by row leaks: a near-duplicate of a
    training document sitting in the eval split inflates eval metrics
    (the classic crawl-corpus leakage bug the dedup-then-split
    literature warns about).

    Map-side only: one hash per row, no shuffle — the caller supplies
    the group key (e.g. exact_dedup's cluster representative or
    dup_components' component id), which is where any shuffle already
    happened. Weights are normalized; bucket thresholds are cumulative
    over the dict's insertion order, so the assignment is replayable in
    any engine with md5 (the oracle bridge).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    total = float(sum(weights.values()))
    b = md5_bucket(group_col, seed, _BUCKET_DENOM)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKET_DENOM
        cond = b < int(round(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)
