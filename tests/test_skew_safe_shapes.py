"""Round-11 skew-safety shapes: the dedup operators that used to rank
inside hot-key windows (duplicate-group fingerprints, shingle posting
lists) must keep their aggregate formulations — a window over such a key
funnels the hot group through ONE task with no map-side combine and no
AQE skew splitting (optimization guide §2.5). Each test pins BOTH the
plan shape (no Window operator where the aggregate replaced one) and
output equality against a row_number reference on a deliberately skewed
fixture (one group owning most rows)."""

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from athena_delta_lake_spark.operators import dedup, text as tx


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _skewed_docs(spark, n_hot: int = 400, n_rest: int = 50):
    hot = [(i, "the same boilerplate text") for i in range(n_hot)]
    rest = [(1000 + i, f"unique document number {i}") for i in range(n_rest)]
    return spark.createDataFrame(hot + rest, "doc_id long, text string")


def test_exact_dedup_is_windowless_and_matches_reference(spark):
    df = _skewed_docs(spark)
    out = dedup.exact_dedup(df, "text", "doc_id")
    assert "Window" not in _plan(out), "exact_dedup regressed to a window"

    # row_number reference (the pre-round-11 formulation)
    h = F.md5(dedup.normalize_text("text"))
    w = W.partitionBy("_h").orderBy("doc_id")
    ref = (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))
    # schema (names, order, types) must survive the struct round trip
    assert out.schema == df.schema


def test_incremental_dedup_is_windowless_and_matches_reference(spark):
    df = _skewed_docs(spark)
    known = spark.createDataFrame(
        [(F_,) for F_ in []], "fp string"
    )
    out = dedup.incremental_exact_dedup(df, "doc_id", "text", known)
    assert "Window" not in _plan(out)
    kept = sorted(r["doc_id"] for r in out.collect())
    # lowest id of the hot group plus every unique doc
    assert kept == [0] + [1000 + i for i in range(50)]
    assert out.schema == df.schema


def test_ngram_pairs_have_no_shingle_keyed_window(spark):
    df = _skewed_docs(spark, n_hot=30, n_rest=20)
    # Assert on the PRE-checkpoint prefix stage: ngram_jaccard_pairs
    # localCheckpoints the prefix, so the final query's executed plan
    # starts at the checkpoint scan and would hide a regressed
    # shingle-keyed window upstream of it (round-11 ADVICE: the old
    # final-plan assertion was vacuous).
    exploded = dedup.shingle_table(df, "doc_id", "text", 3)
    _, prefix = dedup._prefix_stage(exploded, 0.6)
    plan = _plan(prefix)
    assert "Window" in plan, "prefix stage lost its per-id rank window?"
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "shingle" in line.split(
            "windowspecdefinition", 1
        )[1].split(",", 1)[0]:
            raise AssertionError(f"shingle-keyed window reappeared: {line}")
        if "Window" in line and "PARTITION BY shingle" in line:
            raise AssertionError(f"shingle-keyed window reappeared: {line}")
    # every window in the stage must partition by id (never by shingle)
    import re

    for m in re.finditer(r"windowspecdefinition\(([^,]+),", plan):
        assert m.group(1).startswith("id#"), f"unexpected window key: {m.group(0)}"
    # the 30 identical docs form one duplicate clique: C(30,2) exact pairs
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.6)
    assert pairs.count() == 30 * 29 // 2


def test_prefix_stage_exchange_carries_no_nsh_and_checkpoint_no_df(spark):
    """Round-12 byte-slimming shape: the rows flowing into the ranked
    window's exchange carry (id, shingle, df_) only — n_sh is recomputed
    as COUNT(*) over the same id partition — and the prefix returned for
    checkpointing has exactly (shingle, id, n_sh, r), df_ projected away."""
    df = _skewed_docs(spark, n_hot=10, n_rest=10)
    exploded = dedup.shingle_table(df, "doc_id", "text", 3)
    _, prefix = dedup._prefix_stage(exploded, 0.6)
    assert prefix.columns == ["shingle", "id", "n_sh", "r"]
    plan = _plan(prefix)
    # n_sh must be produced BY a window on top of the id exchange (a
    # count(1) windowspec over id), not carried into it as a column, and
    # the ranked stage must need exactly one id-keyed exchange
    assert "count(1) windowspecdefinition(id#" in plan, (
        "n_sh is no longer computed in the ranked window — it is riding "
        "the exchange again"
    )
    n_id_exchanges = plan.count("Exchange hashpartitioning(id#")
    assert n_id_exchanges == 1, f"expected 1 id exchange, got {n_id_exchanges}"


def test_bloom_incremental_dedup_windowless_and_matches_reference(spark):
    """Round-12: incremental_dedup_bloom's within-batch dedup is a min_by
    aggregate (no fp-keyed window) and matches the row_number reference
    on a skewed fixture, with and without corpus overlap."""
    df = _skewed_docs(spark)  # 400 copies of one doc + 50 unique
    known = spark.createDataFrame(
        [(r["fp"],) for r in dedup.fingerprint_table(
            df.filter("doc_id >= 1040"), "doc_id", "text"
        ).collect()],
        "fp string",
    )
    out = dedup.incremental_dedup_bloom(df, "doc_id", "text", known)
    assert "Window" not in _plan(out), "bloom dedup regressed to a window"
    # reference: the pre-round-12 row_number formulation on the same union
    kept = sorted(r["doc_id"] for r in out.collect())
    # hot group -> lowest id 0; unique docs 1000..1049 minus the 10 known
    assert kept == [0] + [1000 + i for i in range(40)]
    assert out.schema == df.schema
    # output must also equal plain incremental_exact_dedup (the docstring
    # contract: identical output, different cost shape)
    ref = dedup.incremental_exact_dedup(df, "doc_id", "text", known)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))


def test_simhash_pairs_single_emission_no_pair_shuffle(spark):
    """Round-12: simhash_pairs keeps each pair on its first agreeing
    slice instead of dropDuplicates — the executed plan must carry NO
    pair-keyed exchange, and the output must equal the dropDuplicates
    reference on a fixture where pairs agree on MULTIPLE slices
    (identical docs agree on all four)."""
    docs = [(i, "an identical document body repeated verbatim") for i in range(6)]
    docs += [(100 + i, f"completely different text number {i} with entropy") for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup.simhash_pairs(df, "doc_id", "text", max_hamming=3)
    plan = _plan(out)
    for line in plan.splitlines():
        if "Exchange hashpartitioning(id_a" in line:
            raise AssertionError(f"pair-keyed exchange reappeared: {line}")
    rows = out.collect()
    # identical docs: hamming 0, every unordered pair exactly once
    got = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in rows)
    expect_clique = sorted(
        (a, b, 0) for a in range(6) for b in range(6) if a < b
    )
    clique = [t for t in got if t[0] < 100 and t[1] < 100]
    assert clique == expect_clique, "pair set or multiplicity changed"
    # and no duplicates anywhere
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_tfidf_and_b08_build_lazily_without_driver_count(spark):
    """Round-12: constructing tfidf_top_terms must not run a Spark job
    (the old driver-side df.count() ran a full corpus pass before the
    main plan existed). Laziness is the observable contract."""
    tracker = spark.sparkContext._jsc.sc().statusTracker()
    df = _skewed_docs(spark, n_hot=5, n_rest=5)
    before = len(tracker.getJobIdsForGroup(None))
    out = tx.tfidf_top_terms(df, "doc_id", "text", top_k=2)
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "building tfidf_top_terms ran a driver-side job"
    assert out.count() > 0


def test_tfidf_df_stays_aggregate_join(spark):
    df = _skewed_docs(spark, n_hot=50, n_rest=10)
    out = tx.tfidf_top_terms(df, "doc_id", "text", top_k=2)
    plan = _plan(out)
    n_window = sum(
        1
        for line in plan.splitlines()
        if line.lstrip(" :+-*").startswith("Window ")  # not WindowGroupLimit
    )
    assert n_window == 1, f"expected only the per-doc top-k window, got {n_window}"
    # doc 0's four terms share tf=1, df=50 (hot group size), so the top-2
    # tiebreak is alphabetical and the score must be ln(60/50)
    import math

    row = out.filter((F.col("term") == "boilerplate") & (F.col("id") == 0)).collect()
    assert row and abs(row[0]["score"] - round(math.log(60 / 50), 6)) < 1e-6
