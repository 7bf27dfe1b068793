"""Plan-lint regression: representative gates stay free of scale red
flags (cartesian/nested-loop joins, global windows, row-Python UDFs) —
the full sweep lives in tools/plan_audit.py."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import ALLOWLIST, audit_plan  # noqa: E402

SUBSET = [
    "q01_pricing_summary",
    "q02b_min_cost_supplier",  # partition-only window: must NOT flag
    "q05_local_supplier_volume",
    "q09_product_profit",
    "q18_large_orders",
    "q24_copurchase_pairs",    # allowlisted 20-row global window
    "j05_interval_band_join",  # the bucketed rewrite: no nested loop
    "a17_salted_two_phase_agg",
    "w01_topk_per_group",
    "w13_time_weighted_avg",
    "x07_repetition_scores",
    "d08_incremental_dedup",
]


def test_audit_subset_clean(spark, sf_dir):
    from athena_delta_lake_spark.queries import registry

    reg = registry()
    bad = {}
    for name in SUBSET:
        df = reg[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        unexpected = audit_plan(plan) - ALLOWLIST.get(name, set())
        if unexpected:
            bad[name] = sorted(unexpected)
    assert not bad, bad


def test_audit_detects_red_flags(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    df = spark.range(100).selectExpr("id", "id % 5 AS k")
    glob = df.withColumn("r", F.row_number().over(W.orderBy("id")))
    assert "global-window" in audit_plan(
        glob._jdf.queryExecution().executedPlan().toString()
    )
    part = df.withColumn("r", F.row_number().over(W.partitionBy("k").orderBy("id")))
    assert "global-window" not in audit_plan(
        part._jdf.queryExecution().executedPlan().toString()
    )
    cross = df.crossJoin(df.selectExpr("id AS id2"))
    flags = audit_plan(cross._jdf.queryExecution().executedPlan().toString())
    assert flags & {"CartesianProduct", "BroadcastNestedLoopJoin"}
