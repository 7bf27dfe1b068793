"""Plan-inspection helpers: the 100 TB design-review tooling.

`explain_summary(df)` distills an executed plan into the facts that matter
at scale — was the filter pushed to the scan, which join strategies were
chosen, how many shuffles — so tests (tests/test_plans.py) can ASSERT the
plan shape instead of eyeballing `.explain()` output. The reference had no
optimizer to inspect; this guards the one we rely on.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    shuffle_exchanges: int = 0
    broadcast_exchanges: int = 0
    hash_aggregates: int = 0
    object_hash_aggregates: int = 0
    sorts: int = 0
    take_ordered: bool = False
    python_evals: int = 0
    raw: str = ""


def _final_plan_string(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString()


def explain_summary(df: DataFrame, execute: bool = True) -> PlanSummary:
    """Summarize the physical plan. With execute=True the query runs first
    (count) so AQE's FINAL plan is inspected — the initial plan lies about
    join strategies under AQE."""
    if execute:
        df.count()
    raw = _final_plan_string(df)
    s = PlanSummary(raw=raw)
    s.pushed_filters = [
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", raw) if m.strip()
    ]
    s.partition_filters = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", raw) if m.strip()
    ]
    s.read_schemas = re.findall(r"ReadSchema: (\S+)", raw)
    s.broadcast_hash_joins = raw.count("BroadcastHashJoin")
    s.sort_merge_joins = raw.count("SortMergeJoin")
    s.nested_loop_joins = raw.count("BroadcastNestedLoopJoin")
    s.shuffle_exchanges = raw.count("Exchange hashpartitioning") + raw.count(
        "Exchange rangepartitioning"
    )
    s.broadcast_exchanges = raw.count("BroadcastExchange")
    s.hash_aggregates = raw.count("HashAggregate")
    s.object_hash_aggregates = raw.count("ObjectHashAggregate")
    s.sorts = raw.count("Sort ")
    s.take_ordered = "TakeOrderedAndProject" in raw
    s.python_evals = raw.count("ArrowEvalPython") + raw.count("BatchEvalPython")
    return s


__all__ = ["PlanSummary", "explain_summary"]
