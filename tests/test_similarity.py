"""Similarity-search correctness: pandas cosine vs numpy, LSH recall vs
brute force (SURVEY §7 hard parts: recall-threshold gate, not hash equality)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark.operators import similarity as sim
from athena_delta_lake_spark.queries.base import load


def test_cosine_pandas_matches_numpy(spark):
    rng = np.random.default_rng(7)
    A = rng.normal(size=(50, 16)).astype(np.float32)
    B = rng.normal(size=(50, 16)).astype(np.float32)
    rows = [(i, A[i].tolist(), B[i].tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, a array<float>, b array<float>")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", sim.cosine_pandas("a", "b").alias("c")).collect()
    }
    for i in range(50):
        a, b = A[i].astype(np.float64), B[i].astype(np.float64)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert got[i] == pytest.approx(want, abs=1e-12)


def test_brute_force_knn_exact(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = sim.brute_force_knn(q, e, k=5)
    rows = res.collect()
    assert {r["q_id"] for r in rows} == {0, 1}
    # self-match ranks first with sim ~= 1
    self_rows = [r for r in rows if r["q_id"] == r["vec_id"]]
    assert all(r["rank"] == 1 and r["sim"] == pytest.approx(1.0, abs=1e-9) for r in self_rows)
    # ranks are contiguous 1..5 per query and sims non-increasing
    for qid in (0, 1):
        rs = sorted((r for r in rows if r["q_id"] == qid), key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        assert all(rs[i]["sim"] >= rs[i + 1]["sim"] for i in range(4))


def test_lsh_ann_recall(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = sim.brute_force_knn(q, e, k=10)
    approx = sim.lsh_ann(q, e, dim=64, k=10)
    ex = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"ANN recall vs brute force too low: {recall}"


def test_label_centroids(spark):
    rows = [
        (1, "a", [1.0, 0.0]),
        (2, "a", [3.0, 2.0]),
        (3, "b", [0.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    cents = {r["label"]: r["centroid"] for r in sim.label_centroids(df).collect()}
    assert cents["a"] == pytest.approx([2.0, 1.0])
    assert cents["b"] == pytest.approx([0.0, 4.0])


def test_near_duplicate_pairs_lsh_mode(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in sim.near_duplicate_pairs_cosine(
            e, threshold=0.45, exact=True
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in sim.near_duplicate_pairs_cosine(
            e, threshold=0.45, dim=64
        ).collect()
    }
    assert lsh <= exact  # verified with exact cosine -> no false positives
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.5


def test_lsh_pair_streams_are_exactly_once_without_dedup_shuffle(spark):
    """Round-12: both LSH pair generators keep a pair only on its FIRST
    agreeing table instead of dropDuplicates — on identical vectors
    (which collide on EVERY table) each pair must still appear exactly
    once, and the plan must carry no pair-keyed exchange."""
    import numpy as np

    rng = np.random.default_rng(3)
    same = rng.normal(size=8).tolist()
    rows = [(i, same) for i in range(4)]  # 4 identical -> all-table collisions
    rows += [(100 + i, rng.normal(size=8).tolist()) for i in range(6)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    nd = sim.near_duplicate_pairs_cosine(
        e, threshold=0.99, dim=8, n_planes=2, n_tables=6
    )
    plan = nd._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(id_a" not in plan, "pair-keyed dedup exchange is back"
    got = [(r["id_a"], r["id_b"]) for r in nd.collect()]
    assert len(got) == len(set(got)), f"duplicate pairs emitted: {sorted(got)}"
    clique = sorted(t for t in got if t[0] < 100)
    assert clique == [(a, b) for a in range(4) for b in range(4) if a < b]

    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    ann = sim.lsh_ann(q, e, dim=8, k=10, n_planes=2, n_tables=6)
    res = ann.collect()
    keys = [(r["q_id"], r["vec_id"]) for r in res]
    assert len(keys) == len(set(keys)), "duplicate candidates survived"
    # identical vectors must all be retrieved with distinct ranks 1..n
    ranks = sorted(r["rank"] for r in res)
    assert ranks == list(range(1, len(ranks) + 1))
    got_ids = {r["vec_id"] for r in res}
    assert {0, 1, 2, 3} <= got_ids


def test_persisted_ivf_index(spark, sf_dir, tmp_path):
    """Index build -> Delta table partitioned by cell; search prunes to
    probed cells; full-probe search == brute force exactly."""
    from athena_delta_lake_spark.delta import DeltaTable

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    idx = str(tmp_path / "ivf_idx")
    C = sim.build_ivf_index(spark, e, idx, n_clusters=8, iters=2)
    assert C.shape[0] == 8

    t = DeltaTable(spark, idx)
    assert t.partition_columns() == ["cell"]
    total_files = len(t.snapshot().files)
    pruned = len(t.pruned_files([("cell", "in", [0, 1])]))
    assert pruned < total_files  # partition pruning engages for probes

    # centroids reload identically
    assert np.allclose(sim.load_ivf_centroids(spark, idx), C)

    # full probe == exact brute force (top-k sets identical)
    res = sim.ivf_search(spark, idx, q, k=5, n_probe=8)
    exact = sim.brute_force_knn(q, e, k=5)
    got = {(r["q_id"], r["rank"]): r["vec_id"] for r in res.collect()}
    want = {(r["q_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    assert got == want

    # partial probe: self-match survives (the query's own cell is probed)
    res2 = sim.ivf_search(spark, idx, q, k=5, n_probe=2)
    top1 = {r["q_id"]: r["vec_id"] for r in res2.collect() if r["rank"] == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}


def test_int8_quantization_error_bound(spark, sf_dir):
    """Dequantized vectors stay within 1% cosine of the originals, and
    quantized values actually fit int8."""
    e = load(spark, sf_dir, "embeddings")
    q = sim.quantize_embeddings(e, "embedding", "q")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dq = sim.dequantize("q", "q_scale")
    dot = F.aggregate(F.zip_with(v, dq, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    nd = F.sqrt(F.aggregate(dq, F.lit(0.0), lambda a, x: a + x * x))
    row = q.select(
        F.min(dot / (nv * nd)).alias("min_cos"),
        F.min(F.array_min("q")).alias("qmin"),
        F.max(F.array_max("q")).alias("qmax"),
    ).first()
    assert row["min_cos"] > 0.99
    assert -127 <= row["qmin"] and row["qmax"] <= 127


def test_pq_ann_recall_and_reconstruction(spark, sf_dir):
    """PQ ANN with exact re-rank recovers most true neighbors; codebook
    reconstructions stay directionally close to the originals."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = sim.brute_force_knn(q, e, k=10)
    approx = sim.pq_ann(q, e, k=10, m=8, k_sub=16, refine=4)
    ex = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"PQ recall vs brute force too low: {recall}"

    C = sim.train_pq(e, "embedding", m=8, k_sub=16)
    assert C.shape == (8, 16, 8)
    rc = sim.pq_reconstruction(e, C, "embedding").agg(
        F.avg("recon_cos").alias("avg"), F.min("recon_cos").alias("min")
    ).first()
    # fixture vectors are near-random (no cluster structure), so 16
    # codewords per 8-dim subspace give moderate alignment; real embedding
    # corpora cluster and reconstruct far tighter
    assert rc["avg"] > 0.6, rc
    assert rc["min"] > 0.3, rc


def test_pq_encode_shape_determinism(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").limit(50)
    C = sim.train_pq(e, "embedding", m=8, k_sub=16, seed=7)
    C2 = sim.train_pq(e, "embedding", m=8, k_sub=16, seed=7)
    import numpy as np
    assert np.allclose(C, C2)  # deterministic training
    enc = sim.pq_encode(e, C, "embedding")
    row = enc.select(
        F.min(F.size("pq")).alias("lo"), F.max(F.size("pq")).alias("hi"),
        F.max(F.array_max("pq")).alias("cmax"), F.min(F.array_min("pq")).alias("cmin"),
    ).first()
    assert row["lo"] == row["hi"] == 8
    assert 0 <= row["cmin"] and row["cmax"] <= 15


def test_mips_norm_augmentation_preserves_ranking(spark, sf_dir):
    """augment_for_mips: cosine ranking over augmented vectors == exact
    inner-product ranking (the MIPS->ANN reduction)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = sim.mips_topk(q, e, k=5)
    want = {
        (r["q_id"], r["rank"]): r["vec_id"] for r in exact.collect()
    }

    import math
    max_norm = math.sqrt(
        e.select(
            F.max(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0), lambda a, b: a + b,
                )
            ).alias("m")
        ).first()["m"]
    )
    aug_c = sim.augment_for_mips(e, "embedding", max_norm)
    aug_q = sim.augment_for_mips(q, "q_vec", max_norm, is_query=True)
    via_cosine = sim.brute_force_knn(aug_q, aug_c, k=5)
    got = {
        (r["q_id"], r["rank"]): r["vec_id"] for r in via_cosine.collect()
    }
    assert got == want


def test_semantic_dedup_within_cluster_only(spark):
    # two identical vectors in cluster 0, an identical pair split ACROSS
    # clusters (must both survive), and a lone orthogonal vector
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),   # dropped: same cluster as 1, cos=1
        (3, [0.0, 1.0], 0),
        (4, [1.0, 0.0], 1),   # survives: near-dup of 1 but other cluster
        (5, [0.6, 0.8], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = sim.semantic_dedup(
        df, "vec_id", "embedding", threshold=0.95, cluster_col="label"
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 4, 5]
    # k-means path: same data, clusters computed; survivors form a valid
    # subset (no two survivors in one cluster above threshold)
    auto = sim.semantic_dedup(
        df, "vec_id", "embedding", threshold=0.95, n_clusters=2
    )
    ids = sorted(r["id"] for r in auto.collect())
    assert 1 <= len(ids) <= 5 and len(set(ids)) == len(ids)


def test_pq_ann_exact_equals_brute_force(spark, sf_dir):
    """pq_ann_exact is exact BY CONSTRUCTION (ADC +/- residual-norm
    bounds), so it must equal brute force including at a deliberately
    terrible operating point — one untrained k-means iteration and only
    4 codewords per subspace — where the conventional refine cut fails."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = sim.brute_force_knn(q, e, k=8)
    got = sim.pq_ann_exact(q, e, k=8, m=8, k_sub=4, iters=1)
    ex = sorted((r["q_id"], r["vec_id"], round(r["sim"], 9)) for r in exact.collect())
    gt = sorted((r["q_id"], r["vec_id"], round(r["sim"], 9)) for r in got.collect())
    assert ex == gt


def test_pq_residual_bound_holds(spark, sf_dir):
    """|cos(q,x) - adc(q,x)| <= pq_resid for every pair: the invariant the
    exact search rests on."""
    e = load(spark, sf_dir, "embeddings").limit(100)
    C = sim.train_pq(e, "embedding", m=8, k_sub=16)
    enc = sim.pq_encode_with_residual(e, C, "embedding")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    pairs = enc.crossJoin(F.broadcast(q)).select(
        sim.cosine_pandas(F.col("q_vec"), F.col("embedding")).alias("cos"),
        sim.pq_adc_score(C, F.col("q_vec"), F.col("pq")).alias("adc"),
        "pq_resid",
    )
    bad = pairs.filter(
        F.abs(F.col("cos") - F.col("adc")) > F.col("pq_resid") + F.lit(1e-9)
    ).count()
    assert bad == 0


def test_semantic_decontamination_hand_computed(spark):
    """One bench vector; corpus rows at cosine 1.0, ~0.707, and 0.0 —
    tau=0.9 flags only the exact-direction match."""
    from athena_delta_lake_spark.operators.similarity import (
        semantic_decontamination,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [1.0, 1.0]), (3, [0.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["contaminated"], r["max_bench_sim"])
        for r in semantic_decontamination(corpus, bench, tau=0.9).collect()
    }
    assert got[1][0] and abs(got[1][1] - 1.0) < 1e-12
    assert not got[2][0] and abs(got[2][1] - 2 ** -0.5) < 1e-12
    assert not got[3][0] and abs(got[3][1]) < 1e-12


def test_semantic_decontamination_empty_bench(spark):
    from athena_delta_lake_spark.operators.similarity import (
        semantic_decontamination,
    )

    bench = spark.createDataFrame([], "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = semantic_decontamination(corpus, bench).collect()
    assert len(rows) == 1 and not rows[0]["contaminated"]


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_semantic_decontamination_threshold_margin(sf):
    """The n09 gate compares float similarities against tau=0.42 in two
    engines; the verdicts agree only because NO fixture similarity sits
    near the threshold. Assert the margin so a fixture regen that lands
    a point within float-noise distance fails loudly here instead of
    flaking the oracle gate."""
    import os

    import duckdb
    import numpy as np

    from tests.conftest import SF_DIR

    con = duckdb.connect()
    path = os.path.join(os.path.dirname(SF_DIR), f"sf{sf}", "embeddings.parquet")
    E = con.execute(
        f"select embedding, label from '{path}'"
    ).fetchall()
    B = np.stack([np.array(e, dtype=np.float64) for e, l in E if l == 0])
    M = np.stack([np.array(e, dtype=np.float64) for e, l in E if l != 0])
    sims = (M @ B.T) / (
        np.linalg.norm(M, axis=1)[:, None] * np.linalg.norm(B, axis=1)[None, :]
    )
    margin = np.abs(sims.max(axis=1) - 0.42).min()
    assert margin > 1e-5, f"sf{sf} margin {margin:.2e} too tight for tau=0.42"


def test_semantic_decontamination_zero_norm_bench_row(spark):
    """A zero-norm bench embedding must not poison every corpus score
    with NaN (np.max propagates NaN): it is dropped, and exact matches
    of the OTHER bench rows still flag."""
    from athena_delta_lake_spark.operators.similarity import (
        semantic_decontamination,
    )

    bench = spark.createDataFrame(
        [(100, [0.0, 0.0]), (101, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [(1, [3.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["contaminated"]
        for r in semantic_decontamination(corpus, bench, tau=0.9).collect()
    }
    assert got == {1: True, 2: False}
    # an ALL-zero bench degenerates to the empty-bench answer
    zbench = spark.createDataFrame(
        [(100, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = semantic_decontamination(corpus, zbench, tau=0.9).collect()
    assert all(not r["contaminated"] for r in rows)
    # non-finite bench rows are degenerate the same way (inf/inf -> NaN)
    ibench = spark.createDataFrame(
        [(100, [float("inf"), 0.0]), (101, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got2 = {
        r["vec_id"]: r["contaminated"]
        for r in semantic_decontamination(corpus, ibench, tau=0.9).collect()
    }
    assert got2 == {1: True, 2: False}


def test_semantic_decontamination_degenerate_corpus_rows(spark):
    """Degenerate CORPUS rows (zero-norm, non-finite, NULL, ragged
    length) must be conservatively KEPT, not flagged: Spark orders NaN
    above every double, so an unguarded `max_bench_sim >= tau` would
    silently flag-and-drop them (ADVICE r9). NULL/ragged rows must not
    crash the Arrow batch either."""
    import math

    from athena_delta_lake_spark.operators.similarity import (
        semantic_decontamination,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0]),            # exact direction -> flagged
            (2, [0.0, 0.0]),            # zero-norm -> NaN sim, kept
            (3, [float("inf"), 1.0]),   # non-finite -> NaN sim, kept
            (4, None),                  # NULL embedding -> kept, no crash
            (5, [1.0, 0.0, 0.0]),       # ragged length -> kept, no crash
        ],
        "vec_id long, embedding array<float>",
    )
    rows = semantic_decontamination(corpus, bench, tau=0.9).collect()
    got = {r["vec_id"]: (r["contaminated"], r["max_bench_sim"]) for r in rows}
    assert got[1][0] and abs(got[1][1] - 1.0) < 1e-12
    for vid in (2, 3, 4, 5):
        assert got[vid][0] is False, f"degenerate row {vid} was flagged"
        s = got[vid][1]
        assert s is None or math.isnan(s)
