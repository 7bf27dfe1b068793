"""Mergeable frequency sketches as plain relations (north-star scale ops).

A count-min sketch expressed as a DataFrame: `(d, bucket, cnt)` with
`bucket = xxhash64(value, d) % width` per hash row `d`. Because the group-by
key space is tiny (depth x width cells), Spark's partial aggregation
collapses each map partition to at most depth*width rows BEFORE the
shuffle — on 100 TB the shuffle carries kilobytes per partition, not data.
The sketch is:

- **mergeable** by exact summation (union -> sum per cell), so per-day /
  per-shard sketches roll up into corpus totals without rescans — same
  incremental pattern as the HLL gate (a14), but for FREQUENCIES;
- **persistable** as a 3-column Delta table (see tests);
- **one-sided**: estimates never undercount; overcount is bounded by
  eps*N (eps ~ e/width) with probability 1 - (1/2)^depth [Cormode &
  Muthukrishnan, J. Algorithms 55(1), 2005].

CMS answers point queries; enumerating heavy hitters additionally needs a
candidate set (here: any small/dimension DataFrame, or distinct keys from
a sample) — `cms_topk` joins candidates against the sketch, never the raw
data.

The reference connector has no aggregation surface at all (it delegates
every aggregate to Athena, README.md:38); sketches extend the rebuilt
engine's surface for corpus-frequency accounting at training-data scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 5
DEFAULT_WIDTH = 2048


def _cell(value: Column, d: Column, width: int) -> Column:
    return F.pmod(F.xxhash64(value, d), F.lit(width))


def cms_build(
    df: DataFrame,
    col: str | Column,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build a `(d, bucket, cnt)` count-min sketch of `col`'s values.

    Nulls are skipped (they have no frequency identity). One narrow explode
    by hash-row then a groupBy whose key cardinality is depth*width — the
    shuffle moves only the partially-combined cells.
    """
    c = F.col(col) if isinstance(col, str) else col
    ex = (
        df.select(c.cast("string").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))))
    )
    return ex.groupBy(
        "d", _cell(F.col("_v"), F.col("d"), width).alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the SAME (depth, width): exact cell-wise
    summation — merged estimates equal the single-pass sketch's exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every candidate key: append `est` =
    min over hash rows of the key's cell count (0 if a cell is absent).

    The sketch side is at most depth*width rows — always broadcast — so
    estimation is a narrow map over the candidate set, no shuffle of
    candidates.
    """
    k = F.col(key_col)
    ex = candidates.withColumn(
        "d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn("bucket", _cell(k.cast("string"), F.col("d"), width))
    joined = ex.join(F.broadcast(sketch), ["d", "bucket"], "left")
    group_cols = [c for c in candidates.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_topk(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    k: int = 10,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Top-k candidate keys by estimated frequency (ties broken by key for
    determinism). TakeOrderedAndProject on the tiny estimated relation."""
    est = cms_estimate(sketch, candidates, key_col, depth, width)
    return est.orderBy(F.desc("est"), F.col(key_col)).limit(k)
