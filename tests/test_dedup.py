"""Dedup operator semantics: exact, n-gram Jaccard, MinHash-LSH recall,
SimHash hamming properties (SURVEY P4 north-star extensions)."""

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.operators import dedup
from athena_delta_lake_spark.queries.base import load


def test_normalize_and_exact_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "hello world"),
            (3, "  HELLO\tWORLD  "),
            (4, "different text"),
        ],
        "id long, text string",
    )
    out = dedup.exact_dedup(df, "text", "id")
    assert sorted(r["id"] for r in out.collect()) == [1, 4]
    groups = dedup.duplicate_groups(df, "text").collect()
    assert len(groups) == 1 and groups[0]["n"] == 3


def test_shingle_table_matches_expression_form(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b"), (3, "x")], "id long, text string"
    )
    tbl = dedup.shingle_table(df, "id", "text", 3)
    got = {
        (r["id"], r["shingle"]) for r in tbl.collect()
    }
    assert got == {
        (1, "a b c"),
        (1, "b c d"),
        (1, "c d e"),
        (2, "a b"),  # shorter-than-k text keeps one short shingle
        (3, "x"),
    }
    n_sh = {r["id"]: r["n_sh"] for r in tbl.collect()}
    assert n_sh == {1: 3, 2: 1, 3: 1}


def test_minhash_recall_vs_exact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.6).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            d, "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.6
        ).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    # LSH candidates are verified with exact jaccard -> no false positives
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_simhash_near_identical_texts_close(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "sleepy", 1)
    other = "completely unrelated content about spark aggregation plans " * 5
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "id long, text string"
    )
    sims = {r["id"]: r["sim"] for r in dedup.simhash_table(df, "id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sims[1], sims[2]) <= 12
    assert ham(sims[1], sims[3]) > ham(sims[1], sims[2])


def test_simhash_pairs_blocking_finds_close_pairs(spark):
    rows = [(i, f"common shared text body number with words {i % 2}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = dedup.simhash_pairs(df, "id", "text", max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # identical texts (same parity) must be found (hamming 0)
    assert (0, 2) in got and (1, 3) in got
    assert all(r["hamming"] <= 3 for r in pairs)


def test_connected_components_topology(spark):
    """Chain, triangle, isolated pair, and a bridge node — components get
    the smallest member as representative."""
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),      # chain 1-2-3-4
            (10, 11), (11, 12), (10, 12),  # triangle
            (20, 21),                     # pair
            (4, 10),                      # bridge merges chain + triangle
        ],
        "id_a long, id_b long",
    )
    comps = {
        r["node"]: r["component"]
        for r in dedup.connected_components(edges).collect()
    }
    assert {comps[n] for n in (1, 2, 3, 4, 10, 11, 12)} == {1}
    assert comps[20] == 20 and comps[21] == 20
    assert len(comps) == 9


def test_incremental_exact_dedup(spark):
    corpus_docs = spark.createDataFrame(
        [(10, "seen before"), (12, "also seen")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "Seen   BEFORE"),      # dup of corpus doc 10 (normalized)
            (3, "brand new"),
            (5, "brand  NEW"),         # within-batch dup of 3
            (7, "another fresh one"),
        ],
        "doc_id long, text string",
    )
    known = dedup.fingerprint_table(corpus_docs, "doc_id", "text")
    out = dedup.incremental_exact_dedup(batch, "doc_id", "text", known)
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 7]
    # broadcast path selects the identical rows
    out_b = dedup.incremental_exact_dedup(
        batch, "doc_id", "text", known, broadcast_known=True
    )
    assert sorted(r["doc_id"] for r in out_b.collect()) == [3, 7]


def test_fingerprint_corpus_roundtrip_and_idempotence(spark, tmp_path):
    path = str(tmp_path / "fp_corpus")
    corpus = dedup.FingerprintCorpus(spark, path)

    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "ALPHA")], "doc_id long, text string"
    )
    fresh1 = corpus.dedup_batch(b1, "doc_id", "text")
    assert sorted(r["doc_id"] for r in fresh1.collect()) == [1, 2]
    corpus.commit_batch(fresh1, "doc_id", "text", txn_app_id="ing", txn_version=1)
    assert corpus.known_fps().count() == 2

    # retried commit of the same run is a no-op (SetTransaction idempotence)
    corpus.commit_batch(fresh1, "doc_id", "text", txn_app_id="ing", txn_version=1)
    assert corpus.known_fps().count() == 2

    # next batch: previously-seen docs are dropped, new ones survive
    b2 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma")], "doc_id long, text string"
    )
    fresh2 = corpus.dedup_batch(b2, "doc_id", "text")
    assert sorted(r["doc_id"] for r in fresh2.collect()) == [5]
    corpus.commit_batch(fresh2, "doc_id", "text", txn_app_id="ing", txn_version=2)
    assert corpus.known_fps().count() == 3


def test_bloom_filter_no_false_negatives_and_bounded_fp(spark):
    from athena_delta_lake_spark.operators.dedup import bloom_build, bloom_prefilter
    from pyspark.sql import functions as F

    known = spark.range(2000).select(F.md5(F.col("id").cast("string")).alias("fp"))
    bloom = bloom_build(known, n_bits=1 << 16, n_hashes=5)
    # filter is tiny relative to the set it summarizes
    assert bloom.count() <= (1 << 16) / 64

    # every known fp passes (no false negatives — the Bloom guarantee)
    passed_known = bloom_prefilter(known, bloom, n_bits=1 << 16, n_hashes=5)
    assert passed_known.count() == 2000

    # unseen fps mostly rejected (bounded false-positive rate)
    fresh = spark.range(10_000, 12_000).select(
        F.md5(F.col("id").cast("string")).alias("fp")
    )
    fp_rate = bloom_prefilter(fresh, bloom, n_bits=1 << 16, n_hashes=5).count() / 2000
    # m/n = 32.8 bits/key, k=5 -> theoretical ~0.0005; allow slack
    assert fp_rate < 0.05, fp_rate


def test_contamination_stats(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely unrelated words appear here only once"),
            (3, "quick brown fox sentences partially overlap benchmarks"),
        ],
        "id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "id long, text string",
    )
    out = {
        r["id"]: (r["n_shared"], r["n_grams"], r["contamination"])
        for r in dedup.contamination_stats(train, bench, "id", "text", k=3).collect()
    }
    # doc 1 is the benchmark verbatim: every 3-gram shared
    assert out[1] == (7, 7, 1.0)
    # doc 2 shares nothing -> absent from the contaminated set
    assert 2 not in out
    # doc 3 shares exactly "quick brown fox" out of its 5 3-grams
    assert out[3] == (1, 5, 0.2)


def test_contamination_bloom_equals_exact(spark):
    train = spark.createDataFrame(
        [(i, f"doc {i} shares the quick brown fox phrase" if i % 3 == 0
          else f"totally unrelated content number {i} here")
         for i in range(30)],
        "id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox phrase appears in benchmarks")],
        "id long, text string",
    )
    exact = sorted(
        tuple(r)
        for r in dedup.contamination_stats(train, bench, "id", "text", k=3).collect()
    )
    via_bloom = sorted(
        tuple(r)
        for r in dedup.contamination_stats_bloom(
            train, bench, "id", "text", k=3, n_bits=1 << 12
        ).collect()
    )
    assert exact == via_bloom and exact  # non-empty, bit-identical
