"""Capture .explain("formatted") for every bench query into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_{before|after}.txt depending on --after flag;
default suffix comes from the tag convention used by the optimization
rounds: `python tools/capture_plans.py r12 --suffix before` and
`--suffix=after` both work (the flag takes a value either way).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402


def main() -> int:
    # --suffix takes a value either as --suffix=before or --suffix before;
    # the space-separated form previously leaked the value into the query
    # list and silently set the suffix to "after" (round-11 ADVICE).
    argv = sys.argv[1:]
    suffix = "before"
    rest: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--suffix"):
            if "=" in a:
                suffix = a.split("=", 1)[1]
            elif i + 1 < len(argv):
                suffix = argv[i + 1]
                i += 1
            i += 1
            continue
        rest.append(a)
        i += 1
    args = [a for a in rest if not a.startswith("--")]
    tag = args[0] if args else "r11"
    names = args[1:] or BENCH_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    from athena_delta_lake_spark import get_spark
    from athena_delta_lake_spark.queries import registry
    from athena_delta_lake_spark.queries.delta_q import _ensure_lineitem_delta

    spark = get_spark(
        app_name="capture_plans",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"},
    )
    _ensure_lineitem_delta(spark, sf_dir)
    reg = registry()
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas")
            if p in plan
        ]
        print(f"{name}: {n_exch} Exchange, joins={joins or '-'}, python={py or '-'}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
