"""Deduplication operators for large-scale training-data pipelines.

All hot paths are codegen-friendly relational plans — scalar built-ins
(xxhash64, getbit, concat_ws), explode + groupBy, window functions — with
NO higher-order array lambdas and NO wide (64-column) aggregates:

- higher-order lambdas (TRANSFORM/AGGREGATE/ZIP_WITH) are interpreted, not
  codegen'd, and re-evaluate captured subexpressions per element — measured
  10-30x slowdowns on these operators;
- 64-wide aggregates generate enormous whole-stage-codegen methods whose
  janino compilation costs 15-30 s per plan — the explode-by-seed
  formulation keeps every generated method small and generic.

Operators:
- exact dedup: hash-groupBy on normalized text (one shuffle);
- n-gram (shingle) Jaccard: explode shingles -> equi-join on shingle ->
  per-pair intersection counts (shuffle on shingle, never O(n^2) pairs
  unless they truly share shingles);
- MinHash + LSH: per-(doc, seed) min of xxhash64(shingle, seed) (classic
  explode-by-seed), band hashes per (doc, band), bucket self-join on
  (band, band_hash), exact-Jaccard verification of candidates only;
- SimHash: 64-bit signatures by bit-vote over word hashes, near-dup =
  hamming distance <= k on pigeonhole-blocked slices.

At 100 TB the shuffle keys here (shingle, band-hash, simhash slice) are
high-cardinality and uniform (hash-distributed), so partitions stay
balanced; hot shingles (stopword-only) are dropped by a document-frequency
cap before the join. Shingle SETS are joined to candidate pairs only AFTER
banding/dedup — candidates are a tiny fraction of the corpus, so the wide
array payload never rides the big shuffles.

Measured scale behavior (local[32]): the naive shingle equi-join is
quadratic in duplicate-group size (392 s on 50k docs with heavy
duplication); the prefix-filtered AllPairs formulation below finds the
identical exact pair set in 4.2 s at sf0.1 (was 18.7 s naive) because only
each doc's rarest (1-t) fraction of shingles is joined, positional
filtering prunes the candidate space ~3x more, and exact verification
touches candidates only. MinHash+LSH remains the cheapest path when
approximate recall is acceptable — it pays per candidate, not per
shingle-collision.

Self-join inputs are materialized with localCheckpoint: Catalyst does not
common-subexpression-eliminate across join branches, so an unmaterialized
self-join recomputes its whole upstream twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# --------------------------------------------------------------- exact dedup


def normalize_text(col: str | Column) -> Column:
    """Lowercase, collapse whitespace, strip — the usual exact-dup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text hash (deterministic).

    MIN_BY(whole row, id) per hash, not row_number() over a hash window
    (round-11): duplicate groups are exactly what this operator exists to
    find, and a 10^7-copy boilerplate group funnels through ONE window
    task — windows get no map-side combine and no AQE skew splitting.
    min_by is a declarative aggregate: each map partition keeps one
    candidate row per hash before the exchange, so the shuffle carries
    (distinct hashes x map partitions) rows whatever the group sizes.

    Precondition: ids are UNIQUE and NON-NULL (true of every id column in
    this engine). Under it, ties are impossible and the result is
    deterministic and identical to the old keep-first window. NULL ids
    would diverge: min_by ignores NULL-ordered rows, so a hash group
    whose ids are all NULL would yield one all-NULL row where the old
    asc_nulls_first window kept a real row."""
    h = F.md5(normalize_text(text_col)).alias("_h")
    row = F.struct(*df.columns).alias("_row")
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min_by(row, F.col(id_col)).alias("_row"))
        .select("_row.*")
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
    """Distinct k-word shingles as an array column (expression form).

    NOTE: higher-order TRANSFORM — interpreted. Fine as a per-row expression
    on small inputs; the pipeline operators below use shingle_table()
    (explode + window, fully codegen'd) instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(normalize_text(c), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingle = lambda i: F.concat_ws(" ", F.slice(words, i, k))  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle))


def shingle_corpus(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """(sets, exploded): per-doc distinct-shingle SETS — the one
    materialization — plus the exploded (id, shingle, n_sh) view derived
    from them by a narrow explode.

    Codegen-only construction with ONE corpus shuffle (round-11
    optimization; was two): hash-repartition the DOC table by id before
    exploding, so the per-doc LEAD window and the collect_set aggregate
    both reuse that partitioning — the old round-robin fan-out plus a
    word-level window exchange shuffled every (id, pos, w) row, strictly
    more bytes than the packed word arrays moved here. The tail-position
    filter tests LEAD(w, k-1) IS NOT NULL directly, which also drops the
    COUNT(*) window pass the old n_words filter needed.

    Only the sets are checkpointed: the exploded form used by the banding
    / prefix-filter stages re-derives by explode (narrow, no shuffle), and
    the exact-Jaccard verification side reads the sets with zero extra
    aggregation — the old flow re-aggregated the exploded table back into
    sets and checkpointed both. Per-doc set size is bounded by document
    length, so collect_set stays small at any corpus scale.

    For texts with fewer than k words a single shorter shingle is kept
    (concat_ws skips the null LEADs, and position 0 survives the filter),
    matching word_shingles semantics.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    docs = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(text_col), " ").alias("_ws"),
    ).repartition(target, "id")
    base = docs.select("id", F.posexplode("_ws").alias("pos", "w"))
    w_ord = W.partitionBy("id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", j).over(w_ord) for j in range(1, k)]
    # full shingle <=> a (k-1)-ahead word exists; pos 0 keeps the single
    # short shingle of sub-k-word docs
    keep = (
        (parts[-1].isNotNull() | (F.col("pos") == 0))
        if k > 1
        else F.lit(True)
    )
    sets = (
        base.withColumn("shingle", F.concat_ws(" ", *parts))
        .withColumn("_keep", keep)
        .filter(F.col("_keep"))
        .groupBy("id")
        .agg(F.collect_set("shingle").alias("sh"))
        .localCheckpoint(eager=True)
    )
    exploded = sets.select(
        "id", F.explode("sh").alias("shingle"), F.size("sh").alias("n_sh")
    )
    return sets, exploded


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Distinct (id, shingle, n_sh) rows, materialized (via shingle_corpus;
    kept for callers that only need the exploded form)."""
    return shingle_corpus(df, id_col, text_col, k)[1]


def shingle_sets(exploded: DataFrame) -> DataFrame:
    """(id, sh array) per doc from a shingle_table — the verification-side
    payload. Exposed so callers running several shingle operators over the
    same corpus (d03+d04 style) aggregate it once and share. Callers that
    build the corpus themselves should prefer shingle_corpus, whose sets
    side costs nothing extra."""
    return exploded.groupBy("id").agg(F.collect_set("shingle").alias("sh"))


def _verify_pairs(
    exploded: DataFrame, cands: DataFrame, threshold: float,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_a, id_b) pairs against the
    full shingle sets. Candidates are a tiny fraction of the corpus, so the
    wide array payload only rides this final small join.

    Candidate pairs arrive possibly-duplicated: the dedup runs HERE, as a
    partition-local aggregate on top of the id_a repartition (hash
    partitioning on id_a alone satisfies the (id_a, id_b) clustering), so
    the old separate dropDuplicates exchange is gone — one shuffle of the
    pair stream instead of two (round-11 optimization).

    The one explicit fixed-width repartition matters: candidate rows are
    tiny (two ids), so AQE coalesces them into one partition by byte size
    — and then the array_intersect work, the REAL cost, runs
    single-threaded (measured 4.2 s -> 1.0 s at sf0.1 from spreading it).
    A numbered repartition is exempt from AQE coalescing and keys the
    shuffle to the first join column. There is deliberately NO second
    repartition before the id_b join (round-11): the pair stream is
    already spread by the id_a shuffle, and by that point it carries the
    sh_a array payload — re-hashing it by id_b was the widest exchange in
    the whole flow. Where the sets side is too big to broadcast, the
    planner inserts the sort-merge redistribution itself; where it
    broadcasts (candidates are a tiny fraction of the corpus), the heavy
    stream now moves zero times."""
    nparts = exploded.sparkSession.sparkContext.defaultParallelism
    if sets is None:
        sets = shingle_sets(exploded)
    a_sets = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b_sets = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.repartition(nparts, "id_a")
        .dropDuplicates(["id_a", "id_b"])
        .join(a_sets, "id_a")
        .join(b_sets, "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        verified.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _prefix_stage(
    exploded: DataFrame, threshold: float, max_shingle_df: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(filtered_exploded, prefix) — the df-ranked prefix of every doc's
    shingle list, UNcheckpointed (ngram_jaccard_pairs materializes it;
    exposed separately so plan tests can inspect the pre-checkpoint shape,
    which a checkpoint would otherwise hide).

    Document frequency comes from a partial-aggregated count joined back,
    NOT a COUNT(*) window over shingle (round-11): a window ships a hot
    shingle's ENTIRE posting list into one task with no map-side combine,
    and AQE skew handling splits only joins, never windows — the exact
    100 TB stall shape §2.5 of the optimization guide warns about, on the
    one key class (boilerplate shingles) guaranteed to be hot in a dedup
    corpus. The aggregate's exchange carries one row per (map partition,
    shingle); the join back is AQE-skew-splittable and costs the same
    shingle-keyed redistribution + sort the window needed anyway.

    The ranked window's exchange carries narrow rows (round-12; guide
    §2.3): n_sh is a per-id count, so COUNT(*) OVER (PARTITION BY id)
    reproduces it on top of the SAME exchange the row_number window needs
    (unordered whole-partition frame: no extra sort, no extra shuffle,
    and per-id partitions are bounded by document length, so no hot-key
    exposure). df_ must ride (it is the sort key) but is projected away
    before the checkpoint, so the materialized prefix carries only
    (shingle, id, n_sh, r). When max_shingle_df is set, n_sh over the
    SURVIVING shingles (jaccard must stay consistent with the filtered
    universe) falls out of the same window count — the old dedicated
    COUNT(*)-over-id window pass is gone."""
    if max_shingle_df is not None:
        keep = (
            exploded.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .filter(F.col("df_") <= max_shingle_df)
        )
        exploded = exploded.join(keep.select("shingle"), "shingle")
    dfreq = exploded.groupBy("shingle").agg(F.count("*").alias("df_"))
    # both window functions share ONE spec (same partition + order): the
    # count's explicit whole-partition frame makes it the partition size,
    # and Spark folds same-spec window expressions into a single Window
    # operator — one exchange, one sort, one pass
    w_ord = W.partitionBy("id").orderBy("df_", "shingle")
    ranked = exploded.select("id", "shingle").join(dfreq, "shingle").select(
        "shingle",
        "id",
        F.count("*")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("n_sh"),
        F.row_number().over(w_ord).alias("r"),
    )
    eps = 1e-9
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh") - eps) + 1
    prefix = ranked.filter(F.col("r") <= prefix_len).select(
        "shingle", "id", "n_sh", "r"
    )
    return exploded, prefix


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    shingles: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """EXACT Jaccard-similar pairs (id_a < id_b) via a prefix-filtered
    set-similarity join (AllPairs / the Vernica-Carey-Li MapReduce
    formulation).

    `shingles` injects a pre-built shingle_table(df, id_col, text_col, k)
    result so callers running several shingle-based operators over the same
    corpus (e.g. exact + MinHash dedup side by side) materialize it once.

    A naive shingle equi-join is quadratic in duplicate-group size: two
    near-identical docs with S shingles contribute S joined rows, and a
    cluster of m duplicates contributes m^2*S. Prefix filtering keeps the
    result exact while joining only each doc's rarest few shingles:

    - order all shingles by ascending document frequency (global total
      order, ties broken by shingle text);
    - any pair with jaccard(A,B) >= t has |A∩B| >= ceil(t*|A|), so the
      first |A| - ceil(t*|A|) + 1 shingles of A in that order must contain
      a shingle of every qualifying partner — index ONLY that prefix;
    - equi-join prefix-vs-prefix, apply the length filter
      (t*|A| <= |B| <= |A|/t), dedup candidates, then verify each
      candidate's exact Jaccard on the full shingle sets.

    At t=0.5 the prefix is half the doc; at t=0.8 a fifth. The floor/ceil
    arithmetic uses an epsilon so float rounding can only LENGTHEN a prefix
    (extra candidates are removed by verification; short prefixes would
    silently drop true pairs).

    `max_shingle_df` additionally drops shingles shared by more than that
    many docs (stopword shingles = skew + noise) before anything else.
    """
    exploded = shingles if shingles is not None else shingle_table(
        df, id_col, text_col, k
    )
    exploded, prefix_plan = _prefix_stage(exploded, threshold, max_shingle_df)
    eps = 1e-9
    prefix = prefix_plan.localCheckpoint(eager=True)
    a = prefix.select(
        "shingle",
        F.col("r").alias("r_a"),
        F.col("id").alias("id_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = prefix.select(
        "shingle",
        F.col("r").alias("r_b"),
        F.col("id").alias("id_b"),
        F.col("n_sh").alias("n_b"),
    )
    # PPJoin positional filter: a token matched at sorted position r_a/r_b
    # caps the achievable overlap at min(n_a - r_a, n_b - r_b) + 1; any
    # qualifying pair needs overlap >= ceil(t/(1+t) * (n_a + n_b)). Cuts
    # candidates ~3x on template-heavy corpora (measured 193k -> 69k at
    # sf0.1) before the pair dedup shuffle.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b")) - eps
    )
    overlap_ub = (
        F.least(F.col("n_a") - F.col("r_a"), F.col("n_b") - F.col("r_b")) + 1
    )
    cands = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a") - eps)
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b") - eps)
            & (overlap_ub >= alpha)
        )
        .select("id_a", "id_b")  # deduped inside _verify_pairs (one shuffle)
    )
    return _verify_pairs(
        exploded, cands, threshold,
        sets=sets if max_shingle_df is None else None,
    )


# ------------------------------------------------------------- MinHash + LSH


def minhash_table(exploded: DataFrame, num_hashes: int) -> DataFrame:
    """(id, seed, h) minima: the classic explode-by-seed MinHash.

    h(id, seed) = MIN over the doc's shingles of xxhash64(shingle, seed).
    One generic MIN aggregate — tiny generated code — instead of a 64-wide
    aggregate whose codegen compilation dominates runtime. Shuffle volume
    is num_hashes x the shingle table, with uniform (id, seed) keys.
    """
    seeds = exploded.withColumn(
        "seed", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1)))
    )
    return seeds.groupBy("id", "seed").agg(
        F.min(F.xxhash64("shingle", F.col("seed"))).alias("h")
    )


def band_table(minhashes: DataFrame, rows_per_band: int) -> DataFrame:
    """(id, band, band_hash): bucket key summarizing the band's
    `rows_per_band` minima.

    band_hash = BIT_XOR over the band of xxhash64(seed, h) — a plain
    codegen'd aggregate (round-11: replaces collect_list + array_sort +
    an interpreted TRANSFORM lambda + concat_ws; XOR rather than SUM so
    ANSI mode has no overflow to reject). Seed-tagging each term keeps
    the signature order-equivalent: two docs get equal band_hash iff
    their xxhash64(seed, h) terms XOR to the same value, which is
    guaranteed when every (seed, minimum) in the band matches — so
    banding keeps ZERO false negatives (the LSH recall S-curve is
    unchanged) — and is astronomically unlikely otherwise; spurious XOR
    collisions only add candidates that exact-Jaccard verification
    removes."""
    banded = minhashes.withColumn(
        "band", F.floor(F.col("seed") / rows_per_band).cast("int")
    )
    return banded.groupBy("id", "band").agg(
        F.expr("bit_xor(xxhash64(seed, h))").alias("band_hash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding, verified with exact
    shingle Jaccard. Returns (id_a, id_b, jaccard) with jaccard >= threshold.

    bands*rows = num_hashes; a pair lands in the same bucket for one band
    with prob 1-(1-j^r)^b — the usual S-curve. The bucket self-join carries
    only (id, band, band_hash); shingle sets join in AFTER candidate dedup,
    so the wide array payload never rides the banding shuffle.

    `shingles` injects a pre-built shingle_table(...) so callers running
    several shingle-based operators over the same corpus share one
    materialization.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    exploded = shingles if shingles is not None else shingle_table(
        df, id_col, text_col, k
    )
    banded = band_table(minhash_table(exploded, num_hashes), rows).localCheckpoint(
        eager=True
    )
    left = banded.select(
        "band", "band_hash", F.col("id").alias("id_a")
    )
    right = banded.select(
        "band", "band_hash", F.col("id").alias("id_b")
    )
    cands = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")  # deduped inside _verify_pairs (one shuffle)
    )
    return _verify_pairs(exploded, cands, threshold, sets=sets)


# ------------------------------------------------------------------- SimHash


def _word_hash64(word: Column, word_hash: str) -> Column:
    """64-bit per-word hash. 'xxhash64' is the fast JVM path; 'md5' derives
    the 64 bits from the first 16 hex chars of md5 (hi<<32 | lo) — slower,
    but reproducible in any engine with an md5() builtin (used by the
    DuckDB-oracled gates)."""
    if word_hash == "xxhash64":
        return F.xxhash64(word)
    if word_hash == "md5":
        hx = F.md5(word)
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)
    raise ValueError(f"unknown word_hash {word_hash!r}")


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, word_hash: str = "xxhash64"
) -> DataFrame:
    """(id, sim) 64-bit SimHash per row: per-word hash, bit-vote, sign.

    Explode words -> hash each word ONCE (scalar hash) -> explode the
    64 bit positions -> one generic SUM(+-1) vote per (id, bit) -> assemble
    the sign bits with SUM(shiftleft(1L, bit)). Every aggregate is small
    and codegen'd; no per-row lambdas, no 64-wide aggregate."""
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("w"),
    ).withColumn("wh", _word_hash64(F.col("w"), word_hash))
    bits = ex.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(63))))
    votes = bits.groupBy("id", "b").agg(
        F.sum(F.getbit("wh", F.col("b")) * 2 - 1).alias("v")
    )
    return votes.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("sim")
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    word_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit slices then verify hamming
    distance — avoids the full n^2. Exhaustive (no false negatives) for
    max_hamming <= 3 with the 4-slice pigeonhole; approximate above that."""
    sh = simhash_table(df, id_col, text_col, word_hash=word_hash).localCheckpoint(
        eager=True
    )
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
    # A pair agreeing on several slices used to be emitted once per slice
    # and deduped with dropDuplicates([id_a, id_b]) — a full extra
    # exchange of the pair stream keyed on the pair (round-11's widest
    # remaining d05 shuffle). The duplicate set is computable per-row:
    # which slices agree is a pure function of sim_a XOR sim_b, so keep
    # each pair only on its FIRST agreeing slice (round-12; guide §2.4 —
    # remove shuffles outright). slice j agrees iff the j-th 16-bit field
    # of the XOR is zero; every joined row's own slice_idx agrees by
    # construction, so exactly one row per pair survives. The hamming
    # filter runs in the same projection, before anything downstream.
    xor = F.col("sim_a").bitwiseXOR(F.col("sim_b"))
    agree = [F.shiftright(F.shiftleft(xor, 16 * j), 48) == 0 for j in range(4)]
    first_agreeing = (
        F.when(agree[0], 0).when(agree[1], 1).when(agree[2], 2).otherwise(3)
    )
    return (
        left.join(right, ["slice_idx", "block"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("slice_idx") == first_agreeing)
        )
        .select(
            "id_a", "id_b", hamming64(F.col("sim_a"), F.col("sim_b")).alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ----------------------------------------------------- incremental dedup


def fingerprint_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp) — md5 of the normalized text, the exact-dup identity key."""
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(normalize_text(text_col)).alias("fp"),
    )


def incremental_exact_dedup(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    known_fps: DataFrame,
    broadcast_known: bool = False,
) -> DataFrame:
    """Rows of `batch` that survive dedup against an existing corpus AND
    within the batch itself — the nightly-ingest primitive: only documents
    never seen before (by normalized-text fingerprint) pass through.

    `known_fps` is a one-column (`fp`) DataFrame — typically the fingerprint
    corpus table maintained by `FingerprintCorpus`. The anti-join shuffles
    on `fp`, an md5 — perfectly uniform at any corpus size; when the known
    set is small (early corpus life), pass broadcast_known=True to skip the
    shuffle entirely. Within-batch dedup keeps the lowest id per fp
    (deterministic), same as exact_dedup — and like exact_dedup (round-11)
    it uses MIN_BY per fingerprint rather than a row_number window, so a
    batch full of copies of one document partial-aggregates map-side
    instead of funneling through one window task.
    """
    fp = F.md5(normalize_text(text_col))
    known = known_fps.select("fp").distinct()
    if broadcast_known:
        known = F.broadcast(known)
    row = F.struct(*batch.columns).alias("_row")
    return (
        batch.withColumn("fp", fp)
        .join(known, "fp", "left_anti")
        .groupBy("fp")
        .agg(F.min_by(row, F.col(id_col)).alias("_row"))
        .select("_row.*")
    )


class FingerprintCorpus:
    """A fingerprint corpus persisted as a Delta table: the state that makes
    exact dedup INCREMENTAL across pipeline runs.

    Workflow per ingest batch:
        corpus = FingerprintCorpus(spark, path)
        fresh  = corpus.dedup_batch(batch, "doc_id", "text")   # unseen docs
        corpus.commit_batch(fresh, "doc_id", "text",
                            txn_app_id="ingest", txn_version=run_id)

    `commit_batch` appends the surviving fingerprints with a SetTransaction
    action, so a retried run is a no-op (exactly-once) — the same mechanism
    the streaming sink uses. At 100 TB the corpus table is billions of
    16-byte fingerprints: the anti-join in dedup_batch shuffles on uniform
    md5 keys, and the corpus scan projects a single column.

    The reference connector has no write path at all (read-only scan,
    DeltaRecordHandler.scala:116-155); this composes the engine's own Delta
    writer with the dedup surface.
    """

    def __init__(self, spark, table_path: str):
        self.spark = spark
        self.path = table_path

    def _exists(self) -> bool:
        import os

        from ..delta.fs import get_fs

        # facade probe — os.path.isdir on a URI table path is always
        # False and would restart the fingerprint state from empty
        # (round-11 sweep)
        return get_fs(self.path).is_dir(
            os.path.join(self.path, "_delta_log")
        )

    def known_fps(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], "fp string")
        from ..delta.table import DeltaTable

        return DeltaTable(self.spark, self.path).to_df(columns=["fp"])

    def dedup_batch(
        self, batch: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        return incremental_exact_dedup(
            batch, id_col, text_col, self.known_fps()
        )

    def commit_batch(
        self,
        surviving: DataFrame,
        id_col: str,
        text_col: str,
        txn_app_id: str | None = None,
        txn_version: int | None = None,
    ) -> int:
        from ..delta.writer import write_delta

        fps = fingerprint_table(surviving, id_col, text_col).select("fp")
        return write_delta(
            fps,
            self.path,
            mode="append",
            txn_app_id=txn_app_id,
            txn_version=txn_version,
        )


# ------------------------------------------------------ duplicate clustering


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for the undirected graph of `edges`; component =
    smallest node id reachable (deterministic representative).

    Min-label propagation: each round every node adopts the minimum label
    in its neighborhood; converges in O(graph diameter) rounds — near-dup
    clusters are dense and shallow, so a handful of rounds suffices at any
    corpus size. Each round is one shuffle join on uniform node keys plus
    a cheap convergence count; labels are materialized per round so the
    lineage (and plan size) stays flat. This is the grouping stage of
    dedup: pick one representative per component, drop the rest.
    """
    und = edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    und = (
        und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            und.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label").alias("vl")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vl").alias("nl"))
            .select(F.col("u").alias("node"), "nl")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nl", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def duplicate_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(component, n_docs) clusters of near-duplicate documents: exact
    prefix-filtered Jaccard pairs -> connected components. The component
    id is the smallest doc id in the cluster (the canonical keeper)."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, k, threshold)
    comps = connected_components(pairs)
    return comps.groupBy("component").agg(F.count("*").alias("n_docs"))


def duplicate_span_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Per-document duplicated-span statistics: how much of each document
    consists of k-word spans that occur MORE THAN ONCE in the corpus —
    the exact-substring dedup signal (dedup of training data by repeated
    spans rather than whole-document similarity).

    Positional k-grams build with LEAD windows (one shuffle on doc id);
    corpus span counts group on the gram text (uniform hash keys); the
    per-doc rollup counts spans whose corpus frequency exceeds one.
    Returns (id, n_spans, n_dup_spans, dup_span_frac).
    """
    words_col = F.split(normalize_text(text_col), " ")
    base = df.select(
        F.col(id_col).alias("id"), F.posexplode(words_col).alias("pos", "w")
    )
    w_ord = W.partitionBy("id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", j).over(w_ord) for j in range(1, k)]
    grams = (
        base.withColumn("n_words", F.count("*").over(W.partitionBy("id")))
        .withColumn("gram", F.concat_ws(" ", *parts))
        .filter(F.col("pos") <= F.col("n_words") - k)
        .select("id", "gram")
    ).localCheckpoint(eager=True)
    counts = grams.groupBy("gram").agg(F.count("*").alias("c"))
    return (
        grams.join(counts, "gram")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_spans"),
        )
        .select(
            "id",
            "n_spans",
            "n_dup_spans",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6).alias(
                "dup_span_frac"
            ),
        )
    )


def contamination_stats(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: per-training-document overlap with an
    evaluation/benchmark corpus, measured in distinct k-word shingles —
    the standard n-gram contamination check run before training (flagged
    docs are dropped or audited).

    Returns (id, n_shared, n_grams, contamination) for every training
    document sharing at least one shingle with the benchmark, where
    `n_shared` counts the doc's distinct shingles that also occur anywhere
    in the benchmark and `contamination` = n_shared / n_grams.

    Scale shape: benchmark suites are tiny relative to a training corpus
    (MBs vs 100 TB), so the distinct benchmark-shingle set is broadcast
    and the training side is consumed map-side by a broadcast semi-join —
    the only corpus-wide shuffle is shingle_table's own per-doc
    aggregation, and output size is bounded by the contaminated subset.
    Pass a precomputed `shingles` table (from shingle_table) to share the
    expensive side with other dedup passes over the same corpus.
    """
    tr = (
        shingles
        if shingles is not None
        else shingle_table(train, id_col, text_col, k)
    )
    bench_sh = (
        shingle_table(bench, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    return (
        tr.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"), F.first("n_sh").alias("n_grams"))
        .select(
            "id",
            "n_shared",
            "n_grams",
            F.round(F.col("n_shared") / F.col("n_grams"), 6).alias(
                "contamination"
            ),
        )
    )


def contamination_stats_bloom(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    shingles: DataFrame | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """contamination_stats at corpus scale: a Bloom filter distilled from
    the benchmark shingles prefilters the training side, so the exact
    semi-join only sees the maybe-contaminated fraction (plus the filter's
    false positives — removed by the join, so the result is EXACT, equal
    to contamination_stats: the Bloom guarantees no false negatives).

    Where the broadcast semi-join of contamination_stats needs the full
    distinct benchmark-shingle set on every executor, the Bloom is
    n_bits/64 rows (a 1M-bit filter = 128 KB) REGARDLESS of benchmark
    size — the right shape when the "benchmark" is itself large (e.g.
    held-out eval corpora in the TB range) or the filter is built once
    and persisted beside the corpus.
    """
    tr = (
        shingles
        if shingles is not None
        else shingle_table(train, id_col, text_col, k)
    )
    bench_sh = (
        shingle_table(bench, id_col, text_col, k).select("shingle").distinct()
    )
    bloom = bloom_build(
        bench_sh, fp_col="shingle", n_bits=n_bits, n_hashes=n_hashes
    )
    candidates = bloom_prefilter(
        tr, bloom, fp_col="shingle", n_bits=n_bits, n_hashes=n_hashes
    )
    return (
        candidates.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"), F.first("n_sh").alias("n_grams"))
        .select(
            "id",
            "n_shared",
            "n_grams",
            F.round(F.col("n_shared") / F.col("n_grams"), 6).alias(
                "contamination"
            ),
        )
    )


# ------------------------------------------------------ relational bloom filter


def bloom_build(
    fps: DataFrame,
    fp_col: str = "fp",
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Build a Bloom filter OVER the cluster as a relation: (word_idx,
    word) rows where `word` is a 64-bit chunk of the bit array. Bits set =
    n_hashes xxhash64 positions per fingerprint; the whole filter is
    n_bits/64 rows (a 1M-bit filter = 16k rows / 128 KB) regardless of
    corpus size — broadcastable state distilled from billions of rows.

    Explode-by-seed then one bit_or aggregate per word: both shuffles key
    uniformly (hash positions). No driver-side bitmap is materialized.
    """
    pos = (
        fps.select(F.col(fp_col).alias("fp"))
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))))
        .select(
            (F.pmod(F.xxhash64("fp", F.col("k"), F.lit(seed)), F.lit(n_bits))).alias(
                "bit"
            )
        )
    )
    words = pos.select(
        (F.col("bit") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("w"),
    )
    return words.groupBy("word_idx").agg(
        F.bit_or("w").alias("word")
    )


def bloom_prefilter(
    batch: DataFrame,
    bloom: DataFrame,
    fp_col: str = "fp",
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Rows of `batch` that are POSSIBLY in the filter's set (definitely-new
    rows are dropped from the expensive path). Guarantee: no false
    negatives — a row whose fingerprint was ever added always passes.

    The batch explodes to its n_hashes probe positions, LEFT-joins the
    (broadcast) word relation, and keeps rows where every probed bit is
    set. At 100 TB this runs BEFORE the anti-join against the fingerprint
    corpus: the corpus-sized shuffle only sees the (tiny) possibly-dup
    fraction plus the filter's false positives.
    """
    probes = (
        batch.withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))))
        .withColumn(
            "_bit",
            F.pmod(F.xxhash64(F.col(fp_col), F.col("_k"), F.lit(seed)), F.lit(n_bits)),
        )
        .withColumn("_widx", (F.col("_bit") / 64).cast("long"))
    )
    joined = probes.join(
        F.broadcast(bloom.withColumnRenamed("word_idx", "_widx")), "_widx", "left"
    ).withColumn(
        "_hit",
        F.when(
            F.col("word").isNotNull()
            & (
                F.col("word").bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 64 AS INT))")
                )
                != 0
            ),
            1,
        ).otherwise(0),
    )
    keep_cols = [c for c in batch.columns]
    return (
        joined.groupBy(*keep_cols)
        .agg(F.min("_hit").alias("_all_hit"))
        .filter(F.col("_all_hit") == 1)
        .drop("_all_hit")
    )


def incremental_dedup_bloom(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    known_fps: DataFrame,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 42,
) -> DataFrame:
    """incremental_exact_dedup with a Bloom pre-filter: IDENTICAL output,
    different cost shape. The broadcastable filter (n_bits/64 longs,
    corpus-size independent) splits the batch; definitely-new rows (most
    of a typical ingest) skip the corpus anti-join entirely, so the
    corpus-sized shuffle only processes possible duplicates + the
    filter's false positives. No-false-negatives keeps the result exact.

    Regime note (measured): at local scale (95k-fp corpus, 100k batch,
    5% dups) this is ~2x SLOWER than the plain anti-join — the filter
    build/probe stages cost more than the small anti-join they avoid.
    The pre-filter pays off when the corpus dwarfs the batch (billions
    of fingerprints: the anti-join must shuffle or broadcast the corpus,
    while the filter stays MB-sized and can also be persisted once and
    reused across many ingest batches via bloom_build on the corpus
    table). Prefer the plain path until the corpus side is the
    bottleneck.
    """
    fp = F.md5(normalize_text(text_col))
    tagged = batch.withColumn("fp", fp)
    bloom = bloom_build(
        known_fps.select("fp").distinct(), "fp", n_bits, n_hashes, seed
    )
    maybe_dup = bloom_prefilter(tagged, bloom, "fp", n_bits, n_hashes, seed)
    definitely_new = tagged.join(
        maybe_dup.select(id_col).distinct(), id_col, "left_anti"
    )
    confirmed_new = maybe_dup.join(
        known_fps.select("fp").distinct(), "fp", "left_anti"
    )
    union = definitely_new.unionByName(confirmed_new)
    # within-batch dedup via MIN_BY per fingerprint, mirroring
    # exact_dedup/incremental_exact_dedup (round-12; guide §2.5): the old
    # row_number() OVER (PARTITION BY fp) funneled a 10^7-copy duplicate
    # group through ONE window task — windows get no map-side combine and
    # no AQE skew splitting, while min_by partial-aggregates map-side so
    # the exchange carries (distinct fps x map partitions) rows whatever
    # the group sizes. Deterministic (ids unique, non-null), identical to
    # the old keep-lowest-id window for non-null ids.
    row = F.struct(*batch.columns).alias("_row")
    return (
        union.groupBy("fp")
        .agg(F.min_by(row, F.col(id_col)).alias("_row"))
        .select("_row.*")
    )
