"""Phase-level timing for the heavy bench queries (guide §1: measure first).

Times each internal stage of the d03/d04 dedup pipeline (and a few other
decomposable queries) with the noop sink so the computation is measured,
not the count() pruning or the sink. Run on a quiet host:

    python tools/phase_bench.py [d03|d04|x06|p07|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df, label, spark):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"  {label}: {dt:.3f}s")
    spark.sparkContext.setJobDescription(None)
    return dt


def main() -> int:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from athena_delta_lake_spark import get_spark
    from athena_delta_lake_spark.operators import dedup
    from athena_delta_lake_spark.queries.base import load

    spark = get_spark(
        app_name="phase_bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"},
    )
    # warm codegen/Python workers
    load(spark, sf_dir, "documents").count()

    if what in ("d03", "all"):
        print("== d03 phases (fresh, no shared cache) ==")
        d = load(spark, sf_dir, "documents")
        t0 = time.time()
        sets, sh = dedup.shingle_corpus(d, "doc_id", "text", 3)
        print(f"  shingle_corpus (localCheckpoint): {time.time()-t0:.3f}s")
        ranked = sh.withColumn(
            "df_", F.count("*").over(W.partitionBy("shingle"))
        ).withColumn(
            "r", F.row_number().over(W.partitionBy("id").orderBy("df_", "shingle"))
        )
        eps = 1e-9
        threshold = 0.6
        prefix_len = (
            F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh") - eps) + 1
        )
        t0 = time.time()
        prefix = ranked.filter(F.col("r") <= prefix_len).localCheckpoint(eager=True)
        print(f"  ranked+prefix (localCheckpoint): {time.time()-t0:.3f}s")
        a = prefix.select(
            "shingle", F.col("r").alias("r_a"), F.col("id").alias("id_a"),
            F.col("n_sh").alias("n_a"),
        )
        b = prefix.select(
            "shingle", F.col("r").alias("r_b"), F.col("id").alias("id_b"),
            F.col("n_sh").alias("n_b"),
        )
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
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        noop(cands, "cands join+dedup", spark)
        verified = dedup._verify_pairs(sh, cands, threshold, sets=sets)
        noop(verified, "verify (re-runs cands)", spark)

    if what in ("d04", "all"):
        print("== d04 phases ==")
        d = load(spark, sf_dir, "documents")
        t0 = time.time()
        _, sh = dedup.shingle_corpus(d, "doc_id", "text", 3)
        print(f"  shingle_corpus again: {time.time()-t0:.3f}s")
        t0 = time.time()
        mh = dedup.minhash_table(sh, 64)
        banded = dedup.band_table(mh, 2).localCheckpoint(eager=True)
        print(f"  minhash+band (localCheckpoint): {time.time()-t0:.3f}s")
        left = banded.select("band", "band_hash", F.col("id").alias("id_a"))
        right = banded.select("band", "band_hash", F.col("id").alias("id_b"))
        cands = (
            left.join(right, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        noop(cands, "band self-join+dedup", spark)

    if what in ("x06", "all"):
        print("== x06 phases ==")
        from athena_delta_lake_spark.operators import text as tx

        d = load(spark, sf_dir, "documents")
        t0 = time.time()
        n = d.count()
        print(f"  n_docs count: {time.time()-t0:.3f}s ({n} docs)")
        noop(tx.tfidf_top_terms(d, "doc_id", "text", 3), "tfidf full", spark)

    if what in ("p07", "all"):
        print("== p07 phases ==")
        from athena_delta_lake_spark.operators import pipeline

        d = load(spark, sf_dir, "documents").select("doc_id")
        t0 = time.time()
        e0 = pipeline.epoch_shuffle(d, "doc_id", epoch=0)
        print(f"  epoch_shuffle e0 build (collect inside): {time.time()-t0:.3f}s")
        noop(e0, "e0 execute", spark)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
