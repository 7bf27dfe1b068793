"""Text-analysis operator semantics: tokenization, quality, language-ID,
fingerprints (SURVEY P4)."""

from pyspark.sql import functions as F

from athena_delta_lake_spark.operators import text as tx


def _one(spark, s, col):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_tokenize_bpe_ish(spark):
    assert _one(spark, "Hello, world! x2", tx.tokenize("text")) == [
        "Hello", ",", "world", "!", "x2",
    ]
    assert _one(spark, "Hello, world! x2", tx.token_count("text")) == 5


def test_quality_score_bands(spark):
    good = " ".join(["the quick brown fox jumps over lazy dogs"] * 4)
    assert _one(spark, good, tx.quality_score("text")) == 1.0
    assert _one(spark, "x", tx.quality_score("text")) == 0.0


def test_language_id(spark):
    cases = {
        "the cat and the dog sat in that house for it": "en",
        "el perro y la casa de madrid que es un lugar": "es",
        "le chat et la maison dans les rues de paris est": "fr",
        "der hund und die katze ist von berlin mit den": "de",
        "zzz qqq www": "und",
    }
    for s, want in cases.items():
        assert _one(spark, s, tx.predict_language("text")) == want, s


def test_fingerprint_order_insensitive(spark):
    a = tx.fingerprint("text")
    f1 = _one(spark, "alpha beta gamma", a)
    f2 = _one(spark, "gamma alpha  beta", a)
    f3 = _one(spark, "alpha beta delta", a)
    assert f1 == f2 != f3


def test_winnow_stable_under_small_edit(spark):
    base = " ".join(f"word{i}" for i in range(60))
    edited = base.replace("word30", "WORDX")
    far = " ".join(f"other{i}" for i in range(60))
    col = tx.winnow_fingerprint("text", window=8, keep=4)
    fp_base = set(_one(spark, base, col))
    fp_edit = set(_one(spark, edited, col))
    fp_far = set(_one(spark, far, col))
    assert len(fp_base & fp_edit) >= len(fp_base & fp_far)
    assert len(fp_base & fp_edit) >= 2  # most fingerprints survive one edit


def test_stopword_ratio(spark):
    v = _one(spark, "the cat and the hat", tx.stopword_ratio("text"))
    assert abs(v - 3 / 5) < 1e-9


def test_repetition_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 2 distinct / 6 words; "a b" bigram 3/5
            (2, "one two three four"),   # no repetition
            (3, "x"),                    # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in tx.repetition_scores(df, "doc_id", "text").collect()
    }
    assert out[1]["n_words"] == 6
    assert abs(out[1]["dup_word_frac"] - (1 - 2 / 6)) < 1e-6
    assert abs(out[1]["top_bigram_frac"] - 3 / 5) < 1e-6
    assert out[2]["dup_word_frac"] == 0.0
    assert abs(out[2]["top_bigram_frac"] - 1 / 3) < 1e-6
    assert out[3]["n_words"] == 1
    assert out[3]["top_bigram_frac"] == 0.0


def test_bpe_pair_counts_hand_computed(spark):
    """'aa ab aa' -> words [aa, ab, aa]: pairs aa x2, ab x1; single-char
    and empty words contribute nothing."""
    from athena_delta_lake_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "AA  ab"), (2, "aa x"), (3, "   ")], "id long, text string"
    )
    rows = {r["pair"]: r["n"] for r in bpe_pair_counts(df, "text").collect()}
    assert rows == {"aa": 2, "ab": 1}


def test_bpe_pair_counts_topk_tiebreak(spark):
    """Equal counts rank by pair ascending — the deterministic tiebreak
    the oracle replays."""
    from athena_delta_lake_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "zz yy xx ww vv uu")], "id long, text string"
    )
    got = [r["pair"] for r in bpe_pair_counts(df, "text", top_n=3).collect()]
    assert got == ["uu", "vv", "ww"]
