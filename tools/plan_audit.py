"""Physical-plan lint for the gate queries: catches scale red flags
BEFORE they burn a cluster.

Flags:
- CartesianProduct / BroadcastNestedLoopJoin — O(n*m) joins that a
  bucketing/equi-join rewrite should have avoided;
- global-window — a Window with no PARTITION BY funnels every row
  through ONE task (the classic 100 TB stall);
- rowpython-udf — row-at-a-time Python eval (BatchEvalPython) in the
  plan; Arrow-batched pandas UDFs (ArrowEvalPython) are the allowed path.

Known-intentional cases are allowlisted with a reason. Usage:

    python tools/plan_audit.py [query_name ...]   # default: batch subset
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> {flag, ...} with the justification in the comment
ALLOWLIST: dict[str, set[str]] = {
    # deliberate tiny cross join (5x25 rows, both sides broadcastable)
    "j02_cross_join_small": {"CartesianProduct", "BroadcastNestedLoopJoin"},
    # rank window runs over a 20-row TakeOrderedAndProject result
    "q24_copurchase_pairs": {"global-window"},
    # epoch_shuffle's bucket-offset cumsum window runs over the <=256
    # per-bucket COUNT rows (16^prefix_hex), never over data rows — it
    # replaced a driver collect() + createDataFrame round trip (round 11)
    "p07_epoch_shuffle": {"global-window"},
    # brute force BY DEFINITION scores every corpus row against every
    # (broadcast) query — the exact baselines; n02/n04/n06 are the scale
    # paths that replace the nested loop with bucketed candidates
    "n01_knn_brute_force": {"BroadcastNestedLoopJoin"},
    "n07_mips_topk": {"BroadcastNestedLoopJoin"},
    # scalar-subquery joins: the nested-loop side is ONE row (the scalar)
    "q11_value_concentration": {"BroadcastNestedLoopJoin"},
    "q22_global_sales_opportunity": {"BroadcastNestedLoopJoin"},
    # dense time-axis spine crossed with distinct groups: output-bounded
    # by construction (n_groups x n_buckets rows)
    "w10_gapfill_hourly": {"BroadcastNestedLoopJoin"},
    # round-12: the corpus count is a 1-row aggregate broadcast-crossJoined
    # into the plan (replacing a blocking driver-side df.count() job) —
    # the nested-loop side is that single row
    "b08_stratified_counts": {"BroadcastNestedLoopJoin"},
    "x06_tfidf_top_terms": {"BroadcastNestedLoopJoin"},
}

# families audited by default: batch relational surface + extensions whose
# plan is built without running a streaming query
DEFAULT_PREFIXES = (
    "q", "a", "b0", "w", "f", "s0", "j", "x", "d01", "d02", "d08", "d11",
    "d12", "p02", "p03", "p07", "m01", "m03", "n01", "n07", "g0", "g1",
)


def audit_plan(plan: str) -> set[str]:
    flags: set[str] = set()
    if "CartesianProduct" in plan:
        flags.add("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        flags.add("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in plan:
        flags.add("rowpython-udf")
    for line in plan.splitlines():
        # WindowExec prints `Window [exprs], [partitionSpec], [orderSpec]`;
        # with no PARTITION BY only two groups remain and the second is the
        # ORDER spec (ASC/DESC). Partition-only windows (two groups, bare
        # columns) parallelize fine and are not flagged.
        if "Window [" in line and line.count("], [") == 1:
            tail = line.rsplit("], [", 1)[1]
            if " ASC" in tail or " DESC" in tail:
                flags.add("global-window")
    return flags


def main(names: list[str]) -> int:
    from athena_delta_lake_spark import get_spark
    from athena_delta_lake_spark.queries import registry

    spark = get_spark(app_name="plan-audit")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    reg = registry()
    if not names:
        names = [
            n for n in sorted(reg) if n.startswith(tuple(DEFAULT_PREFIXES))
        ]

    bad = 0
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # fixture/build errors surface, not crash
            print(f"ERROR {name}: {str(e)[:120]}")
            bad += 1
            continue
        flags = audit_plan(plan)
        allowed = ALLOWLIST.get(name, set())
        unexpected = flags - allowed
        if unexpected:
            print(f"FLAG  {name}: {sorted(unexpected)}")
            bad += 1
        elif flags:
            print(f"allow {name}: {sorted(flags)}")
        else:
            print(f"ok    {name}")
    print(f"\n{bad} queries with unexpected red flags / {len(names)} audited")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
