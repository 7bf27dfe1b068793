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
        # Phases call the SHIPPED internals (_prefix_stage, the
        # shingles/sets injection path of ngram_jaccard_pairs) instead of
        # a re-implementation, so the timings track production code
        # (round-11 ADVICE: the old block re-built the pre-round-11
        # COUNT(*)-window + pre-verify-dropDuplicates formulation).
        print("== d03 phases (fresh, no shared cache) ==")
        d = load(spark, sf_dir, "documents")
        threshold = 0.6
        t0 = time.time()
        sets, sh = dedup.shingle_corpus(d, "doc_id", "text", 3)
        print(f"  shingle_corpus (localCheckpoint): {time.time()-t0:.3f}s")
        _, prefix_plan = dedup._prefix_stage(sh, threshold)
        t0 = time.time()
        prefix_plan.localCheckpoint(eager=True)
        print(f"  ranked+prefix (localCheckpoint): {time.time()-t0:.3f}s")
        pairs = dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", k=3, threshold=threshold, shingles=sh, sets=sets
        )
        noop(pairs, "prefix+cands+verify (shipped operator)", spark)

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
        # candidate dedup lives INSIDE _verify_pairs since round-11; time
        # the shipped operator tail rather than a stale re-implementation
        pairs = dedup.minhash_lsh_pairs(
            load(spark, sf_dir, "documents"), "doc_id", "text",
            k=3, threshold=0.6, shingles=sh,
        )
        noop(pairs, "band join+verify (shipped operator)", spark)

    if what in ("x06", "all"):
        print("== x06 phases ==")
        from athena_delta_lake_spark.operators import text as tx

        # round-12: n_docs is an in-plan broadcast aggregate now — there
        # is no separate driver-side count phase to time anymore
        d = load(spark, sf_dir, "documents")
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
