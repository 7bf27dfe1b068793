"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side built-ins (higher-order array functions, xxhash64)
— no Python UDFs — so they whole-stage-codegen and scale linearly:

- exact dedup: hash-groupBy on normalized text (one shuffle);
- n-gram (shingle) Jaccard: explode shingles -> equi-join on shingle ->
  per-pair intersection counts (shuffle on shingle, never O(n^2) pairs
  unless they truly share shingles);
- MinHash + LSH: signatures via nested TRANSFORM + xxhash64 (columnar),
  banding -> groupBy(band, band_hash) bucket join -> candidate pairs ->
  exact verification. Scales as O(n * H) compute + bucket-local joins;
- SimHash: 64-bit signatures via bit-vote aggregation, near-dup =
  hamming distance <= k on bucket-joined prefixes.

At 100 TB the shuffle keys here (shingle, band-hash, simhash prefix) are
high-cardinality and uniform (hash-distributed), so partitions stay
balanced; hot shingles (stopword-only) are dropped by a document-frequency
cap before the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------- exact dedup


def normalize_text(col: str | Column) -> Column:
    """Lowercase, collapse whitespace, strip — the usual exact-dup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text hash (deterministic)."""
    from pyspark.sql import Window as W

    h = F.md5(normalize_text(text_col)).alias("_h")
    w = W.partitionBy("_h").orderBy(id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def duplicate_groups(df: DataFrame, text_col: str) -> DataFrame:
    """(hash, n_dups) for every normalized text appearing more than once."""
    return (
        df.groupBy(F.md5(normalize_text(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


# ----------------------------------------------------------- shingles / ngrams


def word_shingles(col: str | Column, k: int) -> Column:
    """Distinct k-word shingles of a text column, built entirely JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(normalize_text(c), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingle = lambda i: F.concat_ws(" ", F.slice(words, i, k))  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (id_a < id_b) via a shingle equi-join.

    jaccard(A,B) = |A∩B| / (|A| + |B| - |A∩B|); the join on shingle computes
    the intersection counts without materializing the O(n^2) pair space.
    `max_shingle_df` drops shingles shared by more than that many docs
    (stopword shingles = skew + noise) before the join.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, k).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))
    exploded = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        freq = (
            exploded.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(freq, "shingle")
    a = exploded.select(
        F.col("shingle"),
        F.col("id").alias("id_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = exploded.select(
        F.col("shingle"),
        F.col("id").alias("id_b"),
        F.col("n_sh").alias("n_b"),
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------- MinHash + LSH


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """num_hashes-wide MinHash signature: min over shingles of seed-mixed
    xxhash64. Nested higher-order functions — stays in codegen."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(
                shingles, lambda sh: F.xxhash64(F.concat(sh, F.lit("#"), s.cast("string")))
            )
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding, verified with exact
    shingle Jaccard. Returns (id_a, id_b, jaccard) with jaccard >= threshold.

    bands*rows = num_hashes; a pair lands in the same bucket for one band
    with prob 1-(1-j^r)^b — the usual S-curve. Bucket join shuffles on
    (band, band_hash): uniform keys, no pair explosion.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, k).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sig = base.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
    banded = sig.select(
        "id",
        "shingles",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))
                ),
            )
        ).alias("band", "band_hash"),
    )
    left = banded.select(
        "band", "band_hash", F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")
    )
    right = banded.select(
        "band", "band_hash", F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")
    )
    cands = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------- SimHash


def simhash64(col: str | Column) -> Column:
    """64-bit SimHash of a text column: per-word xxhash64, bit-vote, sign.

    Entirely built-in expressions: fold words into a 64-long vote vector
    with AGGREGATE + ZIP_WITH, then reassemble the sign bits.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(normalize_text(c), " ")
    bit_idx = F.sequence(F.lit(0), F.lit(63))
    votes = F.aggregate(
        words,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, w: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                lambda b: F.when(
                    F.shiftright(F.xxhash64(w), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
            lambda x, y: x + y.cast("long"),
        ),
    )
    bit = lambda b: F.when(F.element_at(votes, b + 1) > 0, F.lit(1).cast("long")).otherwise(  # noqa: E731
        F.lit(0).cast("long")
    )
    out = F.lit(0).cast("long")
    for b in range(64):
        out = out + F.shiftleft(bit(b), b)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on `prefix_bits` high bits (plus the
    rotated variant) then verify hamming distance — avoids the full n^2."""
    sh = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sim"))
    # pigeonhole blocking: split 64 bits into 4 disjoint 16-bit slices; any
    # pair with hamming <= 3 agrees EXACTLY on at least one slice, so joining
    # per-slice finds every such pair (no false negatives for max_hamming<=3)
    blocks = sh.select(
        "id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.shiftleft(F.col("sim"), 16 * i), 48)
                    for i in range(4)
                ]
            )
        ).alias("slice_idx", "block"),
    )
    left = blocks.select(
        "slice_idx", "block", F.col("id").alias("id_a"), F.col("sim").alias("sim_a")
    )
    right = blocks.select(
        "slice_idx", "block", F.col("id").alias("id_b"), F.col("sim").alias("sim_b")
    )
    return (
        left.join(right, ["slice_idx", "block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("sim_a"), F.col("sim_b")).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
