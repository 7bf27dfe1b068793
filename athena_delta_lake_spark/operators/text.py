"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything is built-in expression trees (regexp/array/aggregate functions)
— vectorized JVM execution, no UDFs — so each operator is a narrow
per-row transform with zero shuffles; only the downstream aggregations
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

# small public stopword sets per language for the n-gram/marker heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"],
}


def tokenize(col: str | Column) -> Column:
    """BPE-ish tokens: word pieces OR single non-space punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"), 0)


def token_count(col: str | Column) -> Column:
    return F.size(tokenize(col))


def whitespace_token_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def words(col: str | Column) -> Column:
    return F.split(normalize_text(col), " ")


def stopword_ratio(col: str | Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or _LANG_MARKERS["en"]
    w = words(col)
    sw_arr = F.array(*[F.lit(s) for s in sw])
    n_sw = F.size(F.filter(w, lambda x: F.array_contains(sw_arr, x)))
    return n_sw / F.greatest(F.size(w), F.lit(1))


def quality_score(col: str | Column) -> Column:
    """Deterministic heuristic in [0,1]: length band + mean word length band
    + non-alpha ratio penalty + stopword presence. The exact formula is
    arbitrary; what matters is that it is pure SQL and oracle-replayable."""
    c = F.col(col) if isinstance(col, str) else col
    w = words(c)
    n_words = F.size(w)
    n_chars = F.length(c)
    mean_wlen = n_chars / F.greatest(n_words, F.lit(1))
    sw_ratio = stopword_ratio(c)
    len_ok = F.when((n_words >= 10) & (n_words <= 1000), 0.4).otherwise(0.0)
    wlen_ok = F.when((mean_wlen >= 3) & (mean_wlen <= 12), 0.3).otherwise(0.0)
    sw_ok = F.when(sw_ratio > 0.01, 0.3).otherwise(0.0)
    return len_ok + wlen_ok + sw_ok


def language_scores(col: str | Column) -> dict[str, Column]:
    """Per-language marker-word hit ratio (n-gram-free heuristic lang-ID)."""
    w = words(col)
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(w, lambda x: F.array_contains(arr, x))) / F.greatest(
            F.size(w), F.lit(1)
        )
    return out


def predict_language(col: str | Column) -> Column:
    """argmax over language marker scores; 'und' when no marker hits."""
    scores = language_scores(col)
    pairs = F.array(
        *[
            F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            for lang, s in scores.items()
        ]
    )
    best = F.array_max(pairs)  # struct compare: score first, lang tiebreak
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def fingerprint(col: str | Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    word set (the classic 'fingerprint' clustering key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(col)))))


def rolling_hashes(
    col: str | Column, window: int = 8, hash_fn: str = "xxhash64"
) -> Column:
    """Per-position rolling window hashes (winnowing primitive): hash of
    each `window`-word slice. hash_fn: 'xxhash64' (fastest, JVM-only) or
    'md5' (hex string — engine-portable, so results oracle against other
    engines; winnowing only needs a uniform hash, not a specific one)."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64 | md5)")
    w = words(col)
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1)))
    hf = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    return F.transform(idx, lambda i: hf(F.concat_ws(" ", F.slice(w, i, window))))


def winnow_fingerprint(
    col: str | Column, window: int = 8, keep: int = 4,
    hash_fn: str = "xxhash64",
) -> Column:
    """Winnowing-style robust fingerprint: the `keep` smallest rolling
    hashes, sorted — stable under small edits."""
    return F.slice(F.array_sort(rolling_hashes(col, window, hash_fn)), 1, keep)


def repetition_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style within-document repetition signals, per doc:

    - dup_word_frac: fraction of word occurrences that are repeats of an
      earlier word (1 - distinct/total) — boilerplate and keyword-stuffed
      pages score high;
    - top_bigram_frac: occurrences of the single most frequent word bigram
      over all bigram occurrences — template/chorus repetition.

    One explode of the word stream feeds both: a per-doc count/distinct
    aggregate, and a LEAD-window bigram build whose (doc, bigram) counts
    reduce to max/sum per doc. All shuffles key on doc id or (doc id,
    bigram) — uniform at corpus scale; no arrays ride any shuffle.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "w"),
    )
    word_stats = base.groupBy("id").agg(
        F.count("*").alias("n_words"),
        F.countDistinct("w").alias("n_distinct"),
    )
    nxt = F.lead("w").over(W.partitionBy("id").orderBy("pos"))
    bigrams = (
        base.withColumn("w2", nxt)
        .filter(F.col("w2").isNotNull())
        .groupBy("id", F.concat_ws(" ", "w", "w2").alias("bg"))
        .agg(F.count("*").alias("cnt"))
        .groupBy("id")
        .agg(
            F.max("cnt").alias("top_bg"),
            F.sum("cnt").alias("n_bg"),
        )
    )
    return (
        word_stats.join(bigrams, "id", "left")
        .select(
            F.col("id"),
            F.col("n_words"),
            F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6).alias(
                "dup_word_frac"
            ),
            F.round(
                F.coalesce(F.col("top_bg") / F.col("n_bg"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf = term count in doc,
    idf = ln(N / df). Explode words once; two uniform-key shuffles
    (term counts per doc, document frequency per term) and a per-doc
    window top-k — no UDFs, no driver-side vocabulary.

    N is a 1-row COUNT aggregate broadcast-crossJoined into the scoring
    plan (round-12; guide §5): the old driver-side df.count() was a full
    extra pass over the corpus run as a SEPARATE blocking job before the
    main plan even existed — the same serialize-the-pipeline shape
    round 11 removed from epoch_shuffle. In-plan, the count branch runs
    concurrently with the rest of the query and its one row broadcasts
    for free. CAST to double before the divide keeps the float math
    bit-identical to the old F.lit(float(n_docs)).

    Round-11 note: a COUNT(*) window over term in place of the
    groupBy + equi-join was tried (one exchange fewer at fixture scale,
    inside the noise band) and REJECTED: a window shuffles every tf row
    of a hot term ("the" ~= one row per document) into ONE task with no
    map-side partial aggregation, and AQE skew handling splits only
    joins, never windows (guide §2.5). The aggregate+join form keeps the
    dfreq exchange tiny (partial agg) and the tf-by-term redistribution
    AQE-skew-splittable."""
    from pyspark.sql import Window as W

    from .dedup import normalize_text

    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("term"),
    )
    tf = words.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("_n_docs") / F.col("df")))
        .drop("_n_docs")
    )
    w = W.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("id", "rnk", "term", F.round("score", 6).alias("score"))
    )


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained bigram language-model score per document: the
    CCNet-style quality filter shape (there KenLM perplexity; here an
    exact in-corpus bigram model — no external model file).

    P(w2|w1) = c(w1 w2) / c(w1) over the WHOLE corpus; each document
    scores avg ln P over its bigrams (lower = more surprising = likelier
    junk). One word-stream explode feeds unigram counts, bigram counts
    (LEAD window), and the per-doc join — all shuffle keys are words or
    (doc, position): uniform at corpus scale. Returns
    (id, n_bigrams, avg_logprob).
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias("pos", "w1"),
    ).withColumn("w2", F.lead("w1").over(W.partitionBy("id").orderBy("pos")))
    bigrams = base.filter(F.col("w2").isNotNull()).select("id", "w1", "w2")
    bigrams = bigrams.localCheckpoint(eager=True)  # feeds counts AND the score join

    uni = bigrams.groupBy("w1").agg(F.count("*").alias("c1"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    model = bi.join(uni, "w1").withColumn(
        "logp", F.log(F.col("c2") / F.col("c1"))
    )
    return (
        bigrams.join(model.select("w1", "w2", "logp"), ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("avg_logprob"),
        )
    )


_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(col: str | Column) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, table A1
    subset), each a boolean column computed with codegen built-ins — the
    rule-based pre-filter every large-scale text pipeline runs before
    model-based scoring. All JVM-side: splits, higher-order array
    functions and rlike only (no Python in the hot path)."""
    c = F.col(col) if isinstance(col, str) else col
    ws = F.filter(F.split(c, r"\s+"), lambda x: F.length(x) > 0)
    n_words = F.size(ws)
    mean_wl = F.aggregate(
        ws, F.lit(0.0), lambda a, x: a + F.length(x)
    ) / F.greatest(n_words, F.lit(1))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: x.endswith("...")))
        / n_lines
    )
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda x: F.trim(x).startswith("-")
                | F.trim(x).startswith("*"),
            )
        )
        / n_lines
    )
    alpha_frac = F.size(
        F.filter(ws, lambda x: x.rlike("[A-Za-z]"))
    ) / F.greatest(n_words, F.lit(1))
    hash_ratio = (
        F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    ) / F.greatest(n_words, F.lit(1))
    stop_hits = None
    for wd in _GOPHER_STOPWORDS:
        hit = F.lower(c).rlike(r"\b" + wd + r"\b").cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    return {
        "r_word_count": (n_words >= 50) & (n_words <= 100000),
        "r_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "r_hash_ratio": hash_ratio <= 0.1,
        "r_ellipsis_lines": ellipsis_frac <= 0.3,
        "r_bullet_lines": bullet_frac <= 0.9,
        "r_alpha_words": alpha_frac >= 0.8,
        "r_stopwords": stop_hits >= 2,
    }


def gopher_pass(col: str | Column) -> Column:
    """Conjunction of every gopher rule — the keep/drop bit."""
    rules = gopher_rules(col)
    out = None
    for c in rules.values():
        out = c if out is None else out & c
    return out


def bpe_pair_counts(df: DataFrame, text_col: str, top_n: int = 20) -> DataFrame:
    """First-iteration BPE-trainer statistics: counts of ADJACENT
    character pairs within whitespace words of the normalized text — the
    merge-candidate table a byte-pair-encoding tokenizer trainer ranks
    each round (the top pair becomes the round's merge).

    All codegen built-ins, no UDFs, no driver-side vocabulary: the
    per-word pair expansion (sequence + substring under transform) is
    map-side; the only shuffle is the groupBy over a key space bounded
    by |alphabet|^2, and the top-k compiles to TakeOrderedAndProject —
    partial-aggregated and safe at any corpus size. Ties rank
    deterministically (count desc, pair asc).
    """
    words = df.select(
        F.explode(F.split(normalize_text(text_col), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(top_n)
    )
