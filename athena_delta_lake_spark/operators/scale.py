"""Skew-handling operators: salting for hot keys (SURVEY P6 scale posture).

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but only for sort-merge joins and only per-shuffle.
These operators handle the cases AQE can't:

- salted_join: a hot key on the LEFT fans out across `salt` partitions;
  the (small-side) RIGHT is replicated per salt value. Use when one side
  has pathological key concentration (a single user/document id with
  millions of rows) and the other side is small-per-key.
- two_phase_agg: pre-aggregate on (key, salt) then finalize on key —
  the map-side-combine pattern made explicit for aggregates whose partial
  states are small (sum/count/min/max). Spark already plans partial
  aggregation automatically; the explicit form exists for aggregates over
  EXPRESSIONS Spark can't partially compute (e.g. after an explode that
  re-skews the data).

Salts are deterministic (xxhash64 of the whole row) so results are
reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic `_salt` column in [0, salt)."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*basis), F.lit(salt)).cast("int"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where LEFT has skewed keys: left rows get a deterministic
    salt, right rows are replicated once per salt value, and the join runs
    on (keys + salt) — the hot key's rows spread over `salt` reducers.

    Cost: right side x salt. Use broadcast() instead when right is small
    enough overall; use this when right is too big to broadcast but
    small PER KEY."""
    l_salted = with_salt(left, salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, on + ["_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = 16,
) -> DataFrame:
    """Aggregate with an explicit salted pre-aggregation.

    `aggs` maps output column -> (partial_agg_expr, final_agg_expr), e.g.
        {"n": (F.count("*"), F.sum("n")),
         "total": (F.sum("v"), F.sum("total"))}
    Phase 1 groups by (keys + salt) computing partial_agg aliased to the
    output name; phase 2 groups by keys combining partials with final_agg.
    """
    # spread WITHIN key: salt from the full row, not the keys (key-derived
    # salt would put each key's rows in one salt bucket again)
    salted = with_salt(df, salt)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Persist `df` as a bucketed+sorted managed table: rows are
    hash-partitioned into `n_buckets` files by `bucket_cols` at WRITE time,
    so every later equi-join or aggregation on those columns is
    shuffle-free — the join reads co-located buckets directly. At 100 TB
    this converts the recurring joins of a pipeline (fact-to-fact on a
    shared key) from an every-query shuffle into a one-time layout cost.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(name)
    )


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True when the physical plan joins without any SHUFFLE exchange
    (`Exchange hashpartitioning`) — the bucketed co-location proof; a
    broadcast exchange doesn't count (it moves one small side, not the
    data). Used by tests and layout audits."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan


__all__ = [
    "with_salt",
    "salted_join",
    "two_phase_agg",
    "write_bucketed",
    "is_shuffle_free_join",
]
