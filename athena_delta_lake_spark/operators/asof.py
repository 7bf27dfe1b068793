"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-ins (the preferred path per the
project design rules): union the two sides tagged by origin, sort within
each key partition by (time, origin), and carry the most recent right-side
row forward with last(ignorenulls) over a running window. One shuffle on
the key — same cost profile as a regular sort-merge join, no Python.

An `applyInPandas` + pd.merge_asof variant is provided for the tolerance
case (max staleness), where the window trick would need an extra filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on (direction='backward'; 'forward' = earliest >=),
    matching within `by` keys. Right value columns come back
    null when no match exists (left join semantics).
    """
    by = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    if direction not in {"backward", "forward"}:
        raise ValueError(direction)

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.select(
        *by, F.col(on), *[F.col(c) for c in right_cols]
    ).withColumn("_side", F.lit(0))
    # align schemas: left gets null right-cols, right gets null left-cols
    left_only = [c for c in left.columns if c not in by and c != on]
    for c in right_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    merged = lhs.select(*by, on, "_side", *left_only, *right_cols).unionByName(
        rhs.select(*by, on, "_side", *left_only, *right_cols)
    )

    if direction == "backward":
        # right rows (side=0) sort before left rows at equal time -> a right
        # row AT the same timestamp matches ("<=" semantics)
        w = (
            W.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        w = (
            W.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("_side").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    out = merged
    for c in right_cols:
        out = out.withColumn(
            c, F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    # also surface the matched right timestamp
    out = out.withColumn(
        "_asof_time",
        F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True).over(w),
    )
    return out.filter(F.col("_side") == 1).drop("_side")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """merge_asof per key group via applyInPandas (Arrow-batched).

    Used for tolerance semantics; groups by `by` so each pandas call sees
    one key's rows — bounded memory as long as single-key history fits an
    executor (salt the key upstream if not).
    """
    import pandas as pd

    out_schema = T.StructType(
        left.schema.fields
        + [
            T.StructField(f"r_{f.name}", f.dataType, True)
            for f in right.schema.fields
            if f.name != by
        ]
    )
    r_cols = [f.name for f in right.schema.fields if f.name != by]

    lhs = left.withColumn("_side", F.lit(1))
    rhs = right.withColumn("_side", F.lit(0))
    # align columns for the cogroup
    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_pdf = l_pdf.drop(columns=["_side"]).sort_values(on, kind="mergesort")
        r_pdf = (
            r_pdf.drop(columns=["_side"])
            .sort_values(on, kind="mergesort")
            .rename(columns={c: f"r_{c}" for c in r_cols})
        )
        if l_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        kwargs = {}
        if tolerance_seconds is not None:
            kwargs["tolerance"] = pd.Timedelta(seconds=tolerance_seconds)
        m = pd.merge_asof(
            l_pdf,
            r_pdf.drop(columns=[by], errors="ignore"),
            left_on=on,
            right_on=f"r_{on}",
            direction="backward",
            **kwargs,
        )
        return m[[f.name for f in out_schema.fields]]

    return (
        lhs.groupBy(by)
        .cogroup(rhs.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), schema=out_schema)
    )


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by: list[str],
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs (left, right) with 0 <= left_time - right_time <= max_gap.

    Bucketized range join: both sides bucket by floor(epoch/gap); each left
    row probes its own and the previous bucket — turns the range predicate
    into an equi-join Catalyst can shuffle on, avoiding the
    BroadcastNestedLoopJoin a raw theta join would plan.
    """
    return (
        left.withColumn(
            "_bucket", F.floor(F.unix_timestamp(F.col(left_time)) / max_gap_seconds)
        )
        .withColumn("_probe", F.explode(F.array(F.col("_bucket"), F.col("_bucket") - 1)))
        .alias("L")
        .join(
            right.withColumn(
                "_bucket0",
                F.floor(F.unix_timestamp(F.col(right_time)) / max_gap_seconds),
            ).alias("R"),
            on=[F.col(f"L.{c}") == F.col(f"R.{c}") for c in by]
            + [F.col("L._probe") == F.col("R._bucket0")],
        )
        .filter(
            (
                F.unix_timestamp(F.col(f"L.{left_time}"))
                - F.unix_timestamp(F.col(f"R.{right_time}"))
            ).between(0, max_gap_seconds)
        )
        .drop("_bucket", "_probe", "_bucket0")
    )


def gapfill_time_buckets(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    bucket: str = "1 hour",
    agg: dict[str, F.Column] | None = None,
) -> DataFrame:
    """Resample events onto a dense time axis: truncate to `bucket`, build
    the FULL bucket range (table-global min..max) x distinct groups, left
    join the per-bucket aggregates, zero-fill counts.

    The dense axis is sequence() over a two-row bound — O(buckets x groups)
    rows generated JVM-side, never collected; at 100 TB the only wide
    shuffle is the per-bucket aggregate (uniform keys: time x group).
    Missing buckets surface as n=0 rows — the shape downstream anomaly
    detection / windowing needs (a gap is data, not absence).
    """
    unit = bucket.split()[-1].rstrip("s")  # '1 hour' -> hour
    b = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    per = df.select(b, *group_cols).groupBy("bucket", *group_cols).agg(
        F.count("*").alias("n")
    )
    bounds = df.select(
        F.date_trunc(unit, F.min(ts_col)).alias("lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("hi"),
    )
    axis = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket")
    )
    groups = df.select(*group_cols).distinct()
    dense = axis.crossJoin(groups)
    out = dense.join(per, ["bucket", *group_cols], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    return out


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest time each stage is
    reached AFTER the previous stage (strictly increasing timestamps).
    Returns (stage_idx, stage, n_users) — the classic conversion funnel.

    Relational formulation: stage i is one groupBy(user) of
    min(ts WHERE type = stage_i AND ts > t_{i-1}) joined back — stages are
    few (<= 5 typically), so this is a handful of uniform-key shuffles,
    never a per-user Python loop. Users missing a stage drop out of all
    later stages (inner join), exactly funnel semantics.

    The per-stage user counts are a UNION of 1-row aggregates over the
    lazy stage plans (round-12; guide §5): the old loop ran a blocking
    driver-side reached.count() per stage — each one a separate job that
    recomputed every earlier stage from scratch (quadratic re-execution)
    — then shipped the numbers back via createDataFrame. Now the whole
    funnel is ONE query; no data touches the driver.
    """
    t, ty = F.col(ts_col), F.col(type_col)
    reached = (
        df.filter(ty == stages[0])
        .groupBy(user_col)
        .agg(F.min(t).alias("_t0"))
    )

    def stage_row(r: DataFrame, idx: int, stage: str) -> DataFrame:
        return r.agg(F.count("*").alias("n_users")).select(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )

    out = stage_row(reached, 0, stages[0])
    for i, stage in enumerate(stages[1:], start=1):
        prev_col = f"_t{i - 1}"
        reached = (
            df.filter(ty == stage)
            .join(reached, user_col)
            .filter(t > F.col(prev_col))
            .groupBy(user_col, prev_col)
            .agg(F.min(t).alias(f"_t{i}"))
        )
        out = out.unionByName(stage_row(reached, i, stage))
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point to the interval(s) containing it: lo <= p < hi,
    for ARBITRARY-width intervals (numeric or epoch seconds).

    A raw theta join (p >= lo AND p < hi) plans as a
    BroadcastNestedLoopJoin — every point against every interval. This
    bucketizes instead: each interval explodes to the buckets it covers
    (ceil(len/bucket_width)+1 rows — bounded fan-out), points key by
    their single bucket, and Catalyst gets a plain shuffled equi-join
    with a residual BETWEEN filter. Pick bucket_width near the median
    interval length: wider wastes residual filtering, narrower inflates
    the interval fan-out.
    """
    p_b = F.floor(F.col(point_col) / bucket_width)
    i_bs = F.sequence(
        F.floor(F.col(lo_col) / bucket_width),
        F.floor(F.col(hi_col) / bucket_width),
    )
    lhs = points.withColumn("_b", p_b).alias("P")
    rhs = intervals.withColumn("_b", F.explode(i_bs)).alias("I")
    joined = lhs.join(
        rhs,
        on=[
            F.col("P._b") == F.col("I._b"),
            F.col(f"P.{point_col}") >= F.col(f"I.{lo_col}"),
            F.col(f"P.{point_col}") < F.col(f"I.{hi_col}"),
        ],
        how=how,
    )
    return joined.drop("_b")


def grouped_ewma(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_by: list[str],
    alpha: float,
) -> DataFrame:
    """Per-key exponentially weighted moving average (adjust=False
    recurrence: y_0 = x_0; y_i = (1-a)*y_{i-1} + a*x_i), returning each
    key's final smoothed value and row count.

    The recurrence is inherently sequential PER KEY but embarrassingly
    parallel ACROSS keys — exactly the applyInPandas shape: one shuffle
    on the key, each group's rows sorted and folded inside a single
    Arrow batch (pandas ewm). State never crosses groups, so 100 TB of
    events with uniform keys scales with executors. No closed-form SQL
    rewrite exists that avoids the (1-a)^(-j) overflow at long
    sequences, so this is a genuinely-needed Python-state operator.
    """
    import pandas as pd

    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [key_field,
         T.StructField("ewma", T.DoubleType(), True),
         T.StructField("n", T.LongType(), False)]
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_by, kind="mergesort")
        y = pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "ewma": [float(y.iloc[-1])],
                "n": [len(pdf)],
            }
        )

    return df.select(key_col, value_col, *order_by).groupBy(key_col).applyInPandas(
        fold, out_schema
    )
