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
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.6)
    plan = _plan(pairs)
    # the only windows left run per doc id (prefix rank); the document
    # frequency must be an aggregate+join, never PARTITION BY shingle
    for line in plan.splitlines():
        if "Window" in line and "shingle" in line:
            raise AssertionError(f"shingle-keyed window reappeared: {line}")
    # the 30 identical docs form one duplicate clique: C(30,2) exact pairs
    assert pairs.count() == 30 * 29 // 2


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
