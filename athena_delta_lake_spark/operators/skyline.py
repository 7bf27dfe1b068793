"""Skyline (Pareto-optimal) operator — multi-criteria filtering Spark SQL
lacks natively (cf. "Integration of Skyline Queries into Spark SQL",
EDBT 2023; PAPERS.md).

A row is in the skyline iff no other row dominates it: at least as good
on every criterion and strictly better on one. The scalable shape is the
classic two-phase distributed skyline:

1. **Local phase** (mapInPandas, no shuffle): each partition computes its
   own skyline with a sort-filter scan — sort by the sum of criteria
   (a monotone function, so any dominator precedes its victims), then one
   pass comparing each row against the retained local skyline only.
   Dominated rows die here; at 100 TB this is where ~all pruning happens.
2. **Merge phase**: surviving candidates (tiny: skylines grow
   ~O(log^(d-1) n) for independent dims) are coalesced to one partition
   and filtered the same way once more.

Directions are per-column: 'min' (smaller is better) or 'max'. The
semantics (and the NOT EXISTS oracle shape) treat criteria columns as
non-null numerics.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline_pandas(pdf, crit_cols: list[str]):
    """Sort-filter skyline of one pandas frame; criteria pre-negated so
    every column is minimize."""
    import numpy as np

    if len(pdf) == 0:
        return pdf
    vals = pdf[crit_cols].to_numpy(dtype="float64")
    order = np.argsort(vals.sum(axis=1), kind="stable")
    vals = vals[order]
    keep_rows: list[int] = []
    kept: list = []
    for i in range(len(vals)):
        v = vals[i]
        dominated = False
        for k in kept:
            # k dominates v: <= everywhere, < somewhere
            if (k <= v).all() and (k < v).any():
                dominated = True
                break
        if not dominated:
            kept.append(v)
            keep_rows.append(order[i])
    return pdf.iloc[sorted(keep_rows)]


def skyline(df: DataFrame, criteria: dict[str, str]) -> DataFrame:
    """Rows not dominated under `criteria` ({column: 'min'|'max'})."""
    for c, d in criteria.items():
        if d not in ("min", "max"):
            raise ValueError(f"direction for {c!r} must be 'min' or 'max'")
    crit_cols = []
    work = df
    for i, (c, d) in enumerate(criteria.items()):
        cc = f"_sk{i}"
        expr = F.col(c).cast("double")
        work = work.withColumn(cc, -expr if d == "max" else expr)
        crit_cols.append(cc)

    schema = work.schema

    def local(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = _local_skyline_pandas(pdf, crit_cols)
            if len(out):
                yield out

    candidates = work.mapInPandas(local, schema=schema)
    merged = candidates.coalesce(1).mapInPandas(
        lambda batches: _merge_all(batches, crit_cols), schema=schema
    )
    return merged.drop(*crit_cols)


def _merge_all(batches: Iterator, crit_cols: list[str]) -> Iterator:
    import pandas as pd

    all_pdf = pd.concat(list(batches), ignore_index=True)
    if len(all_pdf):
        yield _local_skyline_pandas(all_pdf, crit_cols)
