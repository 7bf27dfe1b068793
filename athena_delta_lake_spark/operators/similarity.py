"""Similarity search over embedding columns (array<float>).

- cosine/dot/norm as built-in higher-order expressions (ZIP_WITH +
  AGGREGATE in double precision) — JVM-side, codegen'd, no Python;
- brute-force top-k: broadcast the (small) query set, score every row,
  TakeOrderedAndProject per query — the exact baseline;
- random-projection LSH (SimHash-for-vectors) bucketing: sign-bit
  signatures against a broadcast seeded hyperplane matrix, candidates from
  bucket equality on multiple tables, exact re-rank — the scale path
  (shuffles on uniform bucket keys instead of n^2 scoring);
- IVF-style coarse quantization: per-label centroids (or k-means-lite
  via seeded sampling), probe nearest centroids only.

Numeric note: scoring accumulates in DOUBLE in fixed element order, so
results are bit-reproducible run-to-run and engine-to-engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NOTE: np/pd must be module-level: `from __future__ import annotations`
# turns pandas_udf type hints into strings, and PySpark resolves them against
# the function's globals — a local `import pandas as pd` breaks that.


def dot(a: Column, b: Column) -> Column:
    """Expression-level dot product (higher-order fns). NOTE: HOF lambdas are
    interpreted (no codegen) — fine for small/one-off expressions; use
    cosine_pandas for hot paths."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pandas(a: Column, b: Column) -> Column:
    """Vectorized cosine via Arrow-batched pandas_udf + numpy matmul.

    ~100x the interpreted HOF version on pair-scoring paths: each Arrow
    batch becomes two (n, dim) float64 matrices and the similarity is one
    fused numpy expression. Accumulation in float64.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(x.to_numpy()).astype(np.float64)
        B = np.stack(y.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = num / den
        return pd.Series(out)

    return _cos(a, b)


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Broadcast the query set;
    one pass over the corpus; per-query top-k via window (deterministic
    tiebreak on corpus id)."""
    from pyspark.sql import Window as W

    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_pandas(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic seeded Gaussian hyperplanes (driver-side, tiny)."""
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of `vec` against fixed hyperplanes -> long.

    Pandas UDF: one (batch, dim) @ (dim, n_planes) numpy matmul per Arrow
    batch, sign bits packed into a long. The planes matrix is a closure
    constant shipped once per task — the idiomatic replacement for
    per-plane interpreted HOF dot products.
    """
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    weights = (1 << np.arange(P.shape[1], dtype=np.int64))

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        V = np.stack(v.to_numpy()).astype(np.float64)
        bits = (V @ P) > 0
        return pd.Series(bits @ weights)

    return _sig(vec)


def lsh_ann(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-projection LSH buckets ->
    candidates -> exact cosine re-rank.

    Parameter math (sign-random-projection): a pair at cosine s collides on
    one plane with p = 1 - arccos(s)/pi; per table p^n_planes; over T tables
    recall = 1 - (1 - p^n_planes)^T. The fixture's nearest neighbors sit at
    s ~ 0.35 (p ~ 0.61), so few planes + many tables is the operating point
    (4 planes, 10 tables -> ~0.75 expected recall). More planes = smaller
    buckets = cheaper joins but lower recall; tune per workload."""
    from pyspark.sql import Window as W

    c = corpus
    q = queries
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + t)
        c = c.withColumn(f"_b{t}", lsh_signature(F.col(corpus_vec), planes))
        q = q.withColumn(f"_b{t}", lsh_signature(F.col(query_vec), planes))
    # materialize both ONCE: each per-table branch below broadcasts/joins
    # these, and without eager materialization every branch would relaunch
    # the Python-UDF signature stage (~1 s of worker startup per launch)
    c = c.localCheckpoint(eager=True)
    q = q.localCheckpoint(eager=True)
    # Each branch keeps only pairs whose FIRST agreeing table is t — a
    # pure function of the two signature tuples already sitting on the
    # joined row — so the union holds every colliding pair exactly once
    # and the old dropDuplicates([query_id, corpus_id]) is gone entirely
    # (round-12; guide §2.4). That dedup was the only pre-scoring
    # exchange, and it carried BOTH vector payloads; now nothing shuffles
    # until the final per-query top-k window. The cost is t extra longs
    # per side in branch t (signature columns), which never cross an
    # exchange (corpus side streams, query side broadcasts).
    cands = None
    for t in range(n_tables):
        ct = c.select(
            corpus_id,
            corpus_vec,
            F.col(f"_b{t}").alias("_bucket"),
            *[F.col(f"_b{j}").alias(f"_cb{j}") for j in range(t)],
        )
        qt = q.select(
            query_id,
            query_vec,
            F.col(f"_b{t}").alias("_bucket"),
            *[F.col(f"_b{j}").alias(f"_qb{j}") for j in range(t)],
        )
        first_agree = F.lit(True)
        for j in range(t):
            first_agree = first_agree & (F.col(f"_cb{j}") != F.col(f"_qb{j}"))
        pairs = (
            ct.join(F.broadcast(qt), "_bucket")
            .filter(first_agree)
            .select(query_id, query_vec, corpus_id, corpus_vec)
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    scored = cands.select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_pandas(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def label_centroids(
    corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector (IVF coarse-quantizer analogue): posexplode ->
    (label, pos) mean -> re-assemble ordered array. One shuffle on
    (label, pos) — scales with n*dim, not n^2."""
    exploded = corpus.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    per_pos = exploded.groupBy("label", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("avg_val")
    )
    return (
        per_pos.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "avg_val"))
            ).alias("_pairs")
        )
        .select(
            "label",
            F.transform(F.col("_pairs"), lambda s: s.getField("avg_val")).alias(
                "centroid"
            ),
        )
    )


def spherical_kmeans_lite(
    corpus: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 3,
    seed: int = 42,
) -> "np.ndarray":
    """Deterministic spherical k-means for IVF coarse quantization.

    Centroids are tiny metadata (k x dim floats), so the assign step ships
    them as a pandas-UDF closure and the update step is one groupBy mean —
    each iteration is a single distributed pass; only centroids ever reach
    the driver. Init: first k vectors in xxhash64 order (deterministic,
    scan-order independent)."""
    import numpy as np

    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    seed_rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col).cast("array<string>"), F.lit(seed)))
        .limit(k)
        .collect()
    )
    C = np.stack([np.asarray(r[0], dtype=np.float64) for r in seed_rows])
    C /= np.linalg.norm(C, axis=1, keepdims=True)

    for _ in range(iters):
        assigned = corpus.select(
            F.col(vec_col),
            _nearest_centroid_udf(C)(F.col(vec_col)).alias("_c"),
        )
        means = (
            assigned.select("_c", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("_c", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        newC = C.copy()
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["_c"], {})[r["pos"]] = r["m"]
        for c, posmap in by_c.items():
            vec = np.array([posmap[p] for p in sorted(posmap)])
            n = np.linalg.norm(vec)
            if n > 0:
                newC[c] = vec / n
        C = newC
    return C


def _nearest_centroid_udf(C: "np.ndarray"):
    from pyspark.sql.functions import pandas_udf

    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        V = np.stack(v.to_numpy()).astype(np.float64)
        V = V / np.clip(np.linalg.norm(V, axis=1, keepdims=True), 1e-12, None)
        return pd.Series(np.argmax(V @ Cn.T, axis=1).astype("int32"))

    return nearest


def _probe_centroids_udf(C: "np.ndarray", n_probe: int):
    from pyspark.sql.functions import pandas_udf

    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        V = np.stack(v.to_numpy()).astype(np.float64)
        V = V / np.clip(np.linalg.norm(V, axis=1, keepdims=True), 1e-12, None)
        order = np.argsort(-(V @ Cn.T), axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probes


def ivf_ann(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: spherical-kmeans coarse quantizer, queries probe their
    `n_probe` nearest centroids, exact cosine re-rank within probed cells.

    The scale shape: corpus partitions by cell (uniform-ish after k-means),
    each query scores ~n_probe/n_clusters of the corpus. Recall rises with
    n_probe (n_probe == n_clusters -> exact brute force)."""
    from pyspark.sql import Window as W

    C = spherical_kmeans_lite(corpus, corpus_vec, n_clusters, iters, seed)
    assigned = corpus.withColumn(
        "_cell", _nearest_centroid_udf(C)(F.col(corpus_vec))
    ).localCheckpoint(eager=True)
    probed = queries.withColumn(
        "_cell", F.explode(_probe_centroids_udf(C, n_probe)(F.col(query_vec)))
    )
    cands = assigned.join(F.broadcast(probed), "_cell").select(
        query_id, query_vec, corpus_id, corpus_vec
    )
    scored = cands.select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_pandas(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def near_duplicate_pairs_cosine(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 7,
    dim: int | None = None,
    exact: bool = False,
) -> DataFrame:
    """(id_a < id_b, sim) pairs with cosine >= threshold.

    exact=True does the O(n^2) self-join (correctness baseline / oracle
    shape); default uses LSH bucketing so only bucket-colliding pairs are
    scored.
    """
    a = corpus.select(F.col(corpus_id).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(corpus_id).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            raise ValueError("dim required for LSH mode")
        c = corpus
        for t in range(n_tables):
            planes = random_hyperplanes(dim, n_planes, seed + t)
            c = c.withColumn(f"_b{t}", lsh_signature(F.col(vec_col), planes))
        c = c.localCheckpoint(eager=True)  # self-joined per table below
        # first-agreeing-table filter instead of dropDuplicates (round-12;
        # guide §2.4, same recipe as lsh_ann): which tables a pair agrees
        # on is a pure function of the two signature tuples on the joined
        # row, so keeping each pair only where t is its first agreeing
        # table makes the union exactly-once and removes the pair-keyed
        # dedup exchange — which carried BOTH embedding payloads.
        pairs = None
        for t in range(n_tables):
            left = c.select(
                F.col(corpus_id).alias("id_a"),
                F.col(vec_col).alias("va"),
                F.col(f"_b{t}").alias("_bucket"),
                *[F.col(f"_b{j}").alias(f"_ab{j}") for j in range(t)],
            )
            right = c.select(
                F.col(corpus_id).alias("id_b"),
                F.col(vec_col).alias("vb"),
                F.col(f"_b{t}").alias("_bucket"),
                *[F.col(f"_b{j}").alias(f"_bb{j}") for j in range(t)],
            )
            cond = F.col("id_a") < F.col("id_b")
            for j in range(t):
                cond = cond & (F.col(f"_ab{j}") != F.col(f"_bb{j}"))
            p = left.join(right, "_bucket").filter(cond).select(
                "id_a", "va", "id_b", "vb"
            )
            pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.select(
            "id_a", "id_b", cosine_pandas(F.col("va"), F.col("vb")).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def knn_within_group(
    queries: DataFrame,
    corpus: DataFrame,
    q_id: str = "q_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Filtered vector search where the filter is an equi-constraint: each
    query retrieves its top-k ONLY among corpus rows sharing its
    `group_col` (tenant, language, shard, cluster...).

    Unlike brute_force_knn's nested loop, the constraint becomes the JOIN
    KEY: a hash equi-join on group_col scores each query only against its
    group — work is bounded by group size, the shuffle keys on the group
    (uniform when groups are), and no BroadcastNestedLoopJoin appears in
    the plan at any scale. Cosine is the Arrow-batched pandas kernel.
    Returns (q_id, c_id, sim, rank<=k) with rank ties broken by c_id.
    """
    a = queries.select(
        F.col(q_id).alias("q_id"),
        F.col(group_col).alias("_grp"),
        F.col(vec_col).alias("_qv"),
    )
    b = corpus.select(
        F.col(c_id).alias("c_id"),
        F.col(group_col).alias("_grp"),
        F.col(vec_col).alias("_cv"),
    )
    from pyspark.sql import Window as W

    scored = (
        a.join(b, "_grp")
        .withColumn("sim", cosine_pandas(F.col("_qv"), F.col("_cv")))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "sim", "rank")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    cluster_col: str | None = None,
    n_clusters: int = 64,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): partition
    the corpus into clusters, score cosine similarity ONLY within a
    cluster, and drop every item that has a lower-id neighbor at
    sim >= threshold. Returns surviving (id, cluster) rows.

    cluster_col=None runs spherical k-means (the production path: cluster
    assignment is one broadcast-centroid pandas-UDF pass, k x dim floats of
    driver state). Passing an existing cluster/label column makes the
    operator fully deterministic and SQL-expressible (the d12 oracle).

    Scale shape: the self-join is keyed on the cluster id, so work is
    bounded by the largest cluster, not the corpus — SemDeDup's design
    point is n_clusters grows with the corpus to hold cluster size
    roughly constant. Pair scoring is the Arrow-batched pandas cosine; the
    final anti-join keys on id (uniform). No corpus-wide cross join exists
    at any scale.
    """
    if cluster_col is None:
        C = spherical_kmeans_lite(df, vec_col, k=n_clusters, seed=seed)
        df = df.withColumn(
            "_cluster", _nearest_centroid_udf(C)(F.col(vec_col))
        )
        cluster_col = "_cluster"
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("cluster"),
        F.col(vec_col).alias("v"),
    )
    a = base.select(
        F.col("id").alias("id_a"), "cluster", F.col("v").alias("va")
    )
    b = base.select(
        F.col("id").alias("id_b"), "cluster", F.col("v").alias("vb")
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_pandas(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return base.join(dropped, "id", "left_anti").select("id", "cluster")


# ------------------------------------------------- persisted IVF index (Delta)


def build_ivf_index(
    spark,
    corpus: DataFrame,
    index_path: str,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    n_clusters: int = 16,
    iters: int = 2,
    seed: int = 42,
) -> "np.ndarray":
    """Build and PERSIST an IVF index as a Delta table partitioned by cell.

    At 100 TB the k-means + assignment pass is the expensive part — doing
    it once per QUERY (ivf_ann) is wrong; doing it once per corpus and
    storing the assignment is how IVF indexes actually ship. The index is
    a Delta table `index_path` partitioned by `cell`:

    - partition pruning turns an n_probe-cell search into a scan of
      exactly those cells' files (driver-side file pruning, zero I/O on
      the rest of the corpus);
    - centroids ride along as a tiny `_centroids` sub-table, so a search
      session loads k x dim floats, never the corpus;
    - the index is versioned/time-travelable like any Delta table, and
      incremental corpus appends are plain partitioned appends routed by
      `assign_cells`.
    """
    from ..delta import write_delta

    C = spherical_kmeans_lite(corpus, corpus_vec, n_clusters, iters, seed)
    assigned = corpus.select(
        F.col(corpus_id), F.col(corpus_vec),
        _nearest_centroid_udf(C)(F.col(corpus_vec)).alias("cell"),
    )
    write_delta(assigned, index_path, mode="overwrite", partition_by=["cell"])
    cent_rows = [(i, [float(x) for x in C[i]]) for i in range(len(C))]
    cent = spark.createDataFrame(cent_rows, "cell int, centroid array<double>")
    write_delta(cent, index_path.rstrip("/") + "/_centroids", mode="overwrite")
    return C


def load_ivf_centroids(spark, index_path: str) -> "np.ndarray":
    from ..delta import DeltaTable

    rows = (
        DeltaTable(spark, index_path.rstrip("/") + "/_centroids")
        .to_df()
        .orderBy("cell")
        .collect()
    )
    return np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])


def ivf_search(
    spark,
    index_path: str,
    queries: DataFrame,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Search a persisted IVF index: probe each query's n_probe nearest
    cells, scan ONLY those cells' files (Delta partition pruning — the
    scan plan touches n_probe/n_clusters of the index), exact cosine
    re-rank inside the probed cells."""
    from pyspark.sql import Window as W

    from ..delta import DeltaTable

    C = load_ivf_centroids(spark, index_path)
    probed = queries.withColumn(
        "cell", F.explode(_probe_centroids_udf(C, n_probe)(F.col(query_vec)))
    )
    cells = sorted(
        {r["cell"] for r in probed.select("cell").distinct().collect()}
    )
    t = DeltaTable(spark, index_path)
    corpus = t.to_df(where=[("cell", "in", cells)])
    cands = corpus.join(F.broadcast(probed), "cell").select(
        query_id, query_vec, corpus_id, corpus_vec
    )
    scored = cands.select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_pandas(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------- product quantization (PQ)


def train_pq(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    seed: int = 42,
) -> "np.ndarray":
    """Train product-quantization codebooks: split the (L2-normalized)
    vector into `m` subspaces and run k-means with `k_sub` codewords in
    each. Returns (m, k_sub, dim/m) float64 codebooks.

    The m sub-quantizers train in the SAME distributed passes: subvectors
    are keyed by subspace index, so one assign + one (sub_idx, code, pos)
    mean aggregate per iteration trains all m k-means at once. Only the
    m*k_sub*d_sub codebook floats ever reach the driver. Deterministic:
    init picks each subspace's first k_sub subvectors in xxhash64 order.
    """
    from pyspark.sql import Window as W

    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m

    unit = _normalize_expr(vec_col)
    slices = F.array(
        *[F.slice(unit, i * d_sub + 1, d_sub) for i in range(m)]
    )
    sub = corpus.select(
        F.posexplode(slices).alias("sub_idx", "subvec")
    ).localCheckpoint(eager=True)

    w = W.partitionBy("sub_idx").orderBy(
        F.xxhash64(F.col("subvec").cast("array<string>"), F.lit(seed))
    )
    seed_rows = (
        sub.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_sub)
        .select("sub_idx", "_rn", "subvec")
        .collect()
    )
    C = np.zeros((m, k_sub, d_sub), dtype=np.float64)
    for r in seed_rows:
        C[r["sub_idx"], r["_rn"] - 1] = np.asarray(r["subvec"], dtype=np.float64)

    for _ in range(iters):
        assigned = sub.select(
            "sub_idx",
            "subvec",
            _pq_assign_udf(C)(F.col("sub_idx"), F.col("subvec")).alias("code"),
        )
        means = (
            assigned.select(
                "sub_idx", "code", F.posexplode("subvec").alias("pos", "val")
            )
            .groupBy("sub_idx", "code", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("mval"))
            .collect()
        )
        newC = C.copy()
        for r in means:
            newC[r["sub_idx"], r["code"], r["pos"]] = r["mval"]
        C = newC
    return C


def _normalize_expr(vec_col: str) -> Column:
    c = F.col(vec_col)
    n = F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    safe = F.when(n > 0, n).otherwise(F.lit(1.0))
    return F.transform(c, lambda x: x.cast("double") / safe)


def _pq_assign_udf(C: "np.ndarray"):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(sub_idx: pd.Series, subvec: pd.Series) -> pd.Series:
        if len(subvec) == 0:
            return pd.Series([], dtype="int32")
        out = np.empty(len(subvec), dtype="int32")
        V = np.stack(subvec.to_numpy()).astype(np.float64)
        idx = sub_idx.to_numpy()
        for i in np.unique(idx):
            sel = idx == i
            # squared L2 to every codeword of THIS subspace's codebook
            d2 = ((V[sel, None, :] - C[i][None, :, :]) ** 2).sum(axis=2)
            out[sel] = np.argmin(d2, axis=1)
        return pd.Series(out)

    return assign


def pq_encode(
    df: DataFrame, C: "np.ndarray", vec_col: str = "embedding", out_col: str = "pq"
) -> DataFrame:
    """Encode each (normalized) vector as `m` codebook indices
    (array<tinyint> for k_sub <= 128): dim*4 bytes -> m bytes per vector —
    a 64-dim float corpus compresses 32x, which is what makes
    billion-vector in-memory search feasible."""
    from pyspark.sql.functions import pandas_udf

    m, k_sub, d_sub = C.shape

    @pandas_udf("array<tinyint>")
    def encode(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        V = np.stack(v.to_numpy()).astype(np.float64)
        V = V / np.clip(np.linalg.norm(V, axis=1, keepdims=True), 1e-12, None)
        Vs = V.reshape(len(V), m, d_sub)
        codes = np.empty((len(V), m), dtype=np.int8)
        for i in range(m):
            d2 = ((Vs[:, i, None, :] - C[i][None, :, :]) ** 2).sum(axis=2)
            codes[:, i] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return df.withColumn(out_col, encode(F.col(vec_col)))


def pq_adc_score(C: "np.ndarray", q_vec: Column, codes: Column) -> Column:
    """Asymmetric-distance (ADC) approximate cosine: the query stays exact,
    the corpus side is its codeword reconstruction. Per Arrow batch, each
    distinct query builds one (m, k_sub) lookup table; every code row is
    then a gather+sum — no per-pair float math on the corpus vectors."""
    from pyspark.sql.functions import pandas_udf

    m, k_sub, d_sub = C.shape

    @pandas_udf("double")
    def score(qv: pd.Series, cd: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="float64")
        codes_arr = np.stack(cd.to_numpy()).astype(np.int64)  # (n, m)
        Q = np.stack(qv.to_numpy()).astype(np.float64)
        Qn = Q / np.clip(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12, None)
        # group rows by identical query (few distinct queries per batch)
        keys = [q.tobytes() for q in Qn]
        out = np.empty(len(qv), dtype=np.float64)
        uniq: dict[bytes, np.ndarray] = {}
        for j, key in enumerate(keys):
            lut = uniq.get(key)
            if lut is None:
                qs = Qn[j].reshape(m, d_sub)
                lut = np.einsum("id,ikd->ik", qs, C)  # (m, k_sub)
                uniq[key] = lut
            out[j] = lut[np.arange(m), codes_arr[j]].sum()
        return pd.Series(out)

    return score(q_vec, codes)


def pq_ann(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    seed: int = 42,
    refine: int = 4,
) -> DataFrame:
    """PQ ANN with exact re-rank: train codebooks, encode the corpus once,
    take each query's top k*refine by ADC score over the m-byte codes, then
    exact-cosine re-rank those candidates only. At scale the ADC pass scans
    codes (32x smaller than the vectors); the exact pass touches
    k*refine rows per query."""
    from pyspark.sql import Window as W

    C = train_pq(corpus, corpus_vec, m, k_sub, iters, seed)
    encoded = pq_encode(corpus, C, corpus_vec).select(
        corpus_id, corpus_vec, "pq"
    ).localCheckpoint(eager=True)

    approx = encoded.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(query_vec),
        F.col(corpus_id),
        F.col(corpus_vec),
        pq_adc_score(C, F.col(query_vec), F.col("pq")).alias("adc"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("adc"), F.asc(corpus_id))
    cands = approx.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k * refine
    )
    scored = cands.select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_pandas(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w2 = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def pq_encode_with_residual(
    df: DataFrame,
    C: "np.ndarray",
    vec_col: str = "embedding",
    code_col: str = "pq",
    resid_col: str = "pq_resid",
) -> DataFrame:
    """pq_encode plus the per-row quantization residual norm
    r = ||x_norm - reconstruction||_2 — the ingredient that turns ADC from
    a heuristic into a *bounded* estimate: for unit q,
    |cos(q, x) - adc(q, x)| <= r (Cauchy-Schwarz on q . (x - x_hat))."""
    from pyspark.sql.functions import pandas_udf

    m, k_sub, d_sub = C.shape

    @pandas_udf(f"struct<{code_col}: array<tinyint>, {resid_col}: double>")
    def enc(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({code_col: [], resid_col: []})
        V = np.stack(v.to_numpy()).astype(np.float64)
        V = V / np.clip(np.linalg.norm(V, axis=1, keepdims=True), 1e-12, None)
        Vs = V.reshape(len(V), m, d_sub)
        codes = np.empty((len(V), m), dtype=np.int8)
        resid2 = np.zeros(len(V), dtype=np.float64)
        for i in range(m):
            d2 = ((Vs[:, i, None, :] - C[i][None, :, :]) ** 2).sum(axis=2)
            codes[:, i] = np.argmin(d2, axis=1)
            resid2 += d2[np.arange(len(V)), codes[:, i]]
        return pd.DataFrame(
            {
                code_col: [row.tolist() for row in codes],
                resid_col: np.sqrt(resid2),
            }
        )

    packed = df.withColumn("_enc", enc(F.col(vec_col)))
    return packed.select(
        *df.columns,
        F.col(f"_enc.{code_col}").alias(code_col),
        F.col(f"_enc.{resid_col}").alias(resid_col),
    )


def pq_ann_exact(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """PQ search that is provably EXACT for any codebook quality, via the
    ADC error bound: with unit-norm query q and corpus row x,
    cos(q, x) lies in [adc - r, adc + r] where r is x's quantization
    residual norm. Per query, tau = k-th largest lower bound (adc - r);
    every row whose upper bound adc + r >= tau is a candidate (the true
    top-k provably passes: each of its rows has cos >= k-th best cos >=
    tau), and only candidates get the exact-cosine re-rank.

    At 100 TB this is the scan shape you want: the filtering pass reads
    m-byte codes + one double (32x smaller than raw vectors), tau is one
    k-th order statistic per query (broadcast back), and the exact pass
    touches only rows the bound could not exclude — the candidate count
    shrinks as codebook training improves, while correctness never depends
    on it. Unlike pq_ann's fixed k*refine cut, recall here is 1 by
    construction, so the gate oracles against brute force."""
    from pyspark.sql import Window as W

    C = train_pq(corpus, corpus_vec, m, k_sub, iters, seed)
    encoded = pq_encode_with_residual(corpus, C, corpus_vec).select(
        corpus_id, corpus_vec, "pq", "pq_resid"
    )

    approx = encoded.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(query_vec),
        F.col(corpus_id),
        F.col(corpus_vec),
        pq_adc_score(C, F.col(query_vec), F.col("pq")).alias("adc"),
        F.col("pq_resid"),
    )
    # Any k-th largest lower bound is a valid tau (ties included): the
    # exactness proof only needs >= k rows with true sim >= tau. Rank and
    # broadcast tau back in ONE window pass over the shared partitioning —
    # the ADC pandas-UDF scan runs once, not once per consumer.
    w_rank = W.partitionBy(query_id).orderBy(F.desc("_lb"))
    w_part = W.partitionBy(query_id)
    cands = (
        approx.withColumn("_lb", F.col("adc") - F.col("pq_resid"))
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn(
            "_tau",
            F.max(F.when(F.col("_rn") == k, F.col("_lb"))).over(w_part),
        )
        .filter(
            F.col("adc") + F.col("pq_resid")
            >= F.coalesce(F.col("_tau"), F.lit(float("-inf")))
        )
    )
    scored = cands.select(
        F.col(query_id),
        F.col(corpus_id),
        cosine_pandas(F.col(query_vec), F.col(corpus_vec)).alias("sim"),
    )
    w2 = W.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def pq_reconstruction(
    df: DataFrame, C: "np.ndarray", vec_col: str = "embedding"
) -> DataFrame:
    """cosine(original, codeword reconstruction) per row — the PQ error
    meter (1.0 = lossless)."""
    from pyspark.sql.functions import pandas_udf

    m, k_sub, d_sub = C.shape

    @pandas_udf("double")
    def recon_cos(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="float64")
        V = np.stack(v.to_numpy()).astype(np.float64)
        Vn = V / np.clip(np.linalg.norm(V, axis=1, keepdims=True), 1e-12, None)
        Vs = Vn.reshape(len(V), m, d_sub)
        R = np.empty_like(Vs)
        for i in range(m):
            d2 = ((Vs[:, i, None, :] - C[i][None, :, :]) ** 2).sum(axis=2)
            R[:, i, :] = C[i][np.argmin(d2, axis=1)]
        Rf = R.reshape(len(V), -1)
        num = np.einsum("ij,ij->i", Vn, Rf)
        den = np.clip(np.linalg.norm(Rf, axis=1), 1e-12, None)
        return pd.Series(num / den)

    return df.withColumn("recon_cos", recon_cos(F.col(vec_col)))


# ------------------------------------------------- int8 scalar quantization


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: q_i = round(127 * v_i /
    max(|v|)), stored with the scale. 4x smaller than float32 on disk and
    over the wire — at 100 TB of embeddings the scan is I/O-bound, so this
    is a 4x scan speedup for ~<1% cosine error (verified in tests). Pure
    expression (transform over the array + one aggregate for the max) —
    JVM-side, acceptable off the hot pair-scoring path.
    """
    c = F.col(vec_col)
    absmax = F.array_max(F.transform(c, lambda x: F.abs(x.cast("double"))))
    scale = F.when(absmax > 0, absmax / 127.0).otherwise(F.lit(1.0))
    q = F.transform(
        c, lambda x: F.round(x.cast("double") / scale).cast("tinyint")
    )
    return df.withColumn(out_col, q).withColumn(f"{out_col}_scale", scale)


def dequantize(q_col: str = "q", scale_col: str = "q_scale") -> Column:
    """array<tinyint> + scale -> array<double> (approximate original)."""
    return F.transform(
        F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)
    )


# ------------------------------------------------- max-inner-product search


def dot_pandas(a: Column, b: Column) -> Column:
    """Vectorized float64 dot product (Arrow-batched numpy einsum)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(x: pd.Series, y: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack(x.to_numpy()).astype(np.float64)
        B = np.stack(y.to_numpy()).astype(np.float64)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return _dot(a, b)


def mips_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact maximum-inner-product top-k (recommendation scoring: user
    vector x item embeddings, where magnitude matters and cosine is the
    WRONG ranking). Broadcast queries, one corpus pass, per-query top-k.

    Scale path: MIPS reduces to cosine ANN by the norm-augmentation
    transform (append sqrt(M^2 - |x|^2) to items, 0 to queries, M = max
    item norm — see augment_for_mips); the augmented vectors feed the
    LSH/IVF/PQ pipelines unchanged.
    """
    from pyspark.sql import Window as W

    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id),
        F.col(corpus_id),
        dot_pandas(F.col(query_vec), F.col(corpus_vec)).alias("score"),
    )
    w = W.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def augment_for_mips(
    corpus: DataFrame, vec_col: str, max_norm: float, is_query: bool = False
) -> DataFrame:
    """Norm-augmentation (the standard MIPS->cosine reduction): items get
    an extra coordinate sqrt(M^2 - |x|^2), queries get 0 — inner products
    are preserved while all item norms equal M, so cosine ANN over the
    augmented vectors ranks by inner product."""
    c = F.col(vec_col)
    sq = F.aggregate(
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    extra = (
        F.lit(0.0)
        if is_query
        else F.sqrt(F.greatest(F.lit(float(max_norm)) ** 2 - sq, F.lit(0.0)))
    )
    return corpus.withColumn(
        vec_col, F.concat(c.cast("array<double>"), F.array(extra))
    )


def semantic_decontamination(
    corpus: DataFrame,
    bench: DataFrame,
    emb_col: str = "embedding",
    tau: float = 0.42,
    bench_emb_col: str | None = None,
) -> DataFrame:
    """Semantic benchmark decontamination: flag corpus rows whose
    embedding sits within cosine `tau` of ANY benchmark row — the
    embedding-space analogue of the 8-gram decontamination
    (dedup.decontaminate). A paraphrased eval question shares no shingle
    with its source, but lands right next to it in embedding space; both
    checks together are the standard pre-training hygiene pass.

    Scale posture mirrors the n-gram variant: benchmarks are SMALL
    (thousands of rows), so the bench matrix is collected once — bounded
    by benchmark size, the same model-parameter class as k-means
    centroids — L2-normalized, and closed over by an Arrow-batched
    pandas_udf. The 100 TB corpus is scored in ONE map-side pass
    (float64 matmul per batch), zero shuffle, no self-join. Adds
    `max_bench_sim` (max cosine over the bench set) and `contaminated`
    (max_bench_sim >= tau). Zero-norm BENCH rows are dropped (no
    direction to match — and a NaN row would poison every corpus score
    through np.max). Degenerate CORPUS rows (zero-norm, non-finite,
    NULL, or wrong-dimension embeddings) score NaN and are explicitly
    NOT flagged: Spark orders NaN above every double, so a bare
    `>= tau` would silently flag-and-drop exactly the rows we mean to
    keep — the flag is therefore isnan-guarded to False.
    """
    from pyspark.sql.functions import pandas_udf

    rows = bench.select(bench_emb_col or emb_col).collect()  # bench-sized
    if not rows:
        return corpus.withColumn(
            "max_bench_sim", F.lit(None).cast("double")
        ).withColumn("contaminated", F.lit(False))
    B = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(B, axis=1)
    # a zero-norm or non-finite bench row has no direction to match —
    # and normalizing it yields a NaN row that np.max would propagate to
    # EVERY corpus score, silently disabling the whole pass (review
    # finding; inf/inf is NaN too, so finiteness matters as much as
    # positivity). Drop them; an all-degenerate bench reduces to the
    # empty-bench answer.
    ok = np.isfinite(norms) & (norms > 0)
    B = B[ok] / norms[ok, None]
    if B.shape[0] == 0:
        return corpus.withColumn(
            "max_bench_sim", F.lit(None).cast("double")
        ).withColumn("contaminated", F.lit(False))

    dim = B.shape[1]

    @pandas_udf("double")
    def _max_sim(v: pd.Series) -> pd.Series:
        out = np.full(len(v), np.nan, dtype=np.float64)
        if len(v) == 0:
            return pd.Series(out)
        # NULL or wrong-length embeddings would raise inside np.stack
        # and fail the whole job; score them NaN (un-matchable) instead,
        # matching the n-gram decontaminate path's tolerance.
        valid = np.fromiter(
            (a is not None and len(a) == dim for a in v.to_numpy()),
            dtype=bool,
            count=len(v),
        )
        if valid.any():
            M = np.stack(v.to_numpy()[valid]).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                M = M / np.linalg.norm(M, axis=1, keepdims=True)
            out[valid] = (M @ B.T).max(axis=1)
        return pd.Series(out)

    scored = corpus.withColumn("max_bench_sim", _max_sim(F.col(emb_col)))
    # Spark SQL treats NaN as GREATER than any double, so NaN >= tau is
    # TRUE — the exact opposite of "conservatively kept". Guard it.
    return scored.withColumn(
        "contaminated",
        F.when(F.isnan("max_bench_sim") | F.isnull("max_bench_sim"), F.lit(False))
        .otherwise(F.col("max_bench_sim") >= F.lit(float(tau))),
    )
