"""Driver-side file pruning: partition predicates + Delta min/max stats.

The reference's only optimization was partition pruning via constraint-checked
block writes (/root/reference/DeltaMetadataHandler.scala:125-137); it ignored
the per-file `stats` JSON carried by `add` actions (SURVEY §2.C). Here both
run BEFORE `spark.read`, so skipped files never appear in the scan plan —
cheaper than a Catalyst rule and effective at any scale (pruning work is
O(candidate files) driver-side metadata, no cluster I/O).

Predicates are simple conjunctive triples `(column, op, value)` with
op in {=, !=, <, <=, >, >=, in}. This is deliberately the same shape as
Spark DataSource pushdown filters; anything not expressible stays in the
Catalyst Filter that still runs on the scan output (double-filtering is
harmless, skipping is monotone-safe: a file is dropped only when it
PROVABLY contains no matching row).
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

from pyspark.sql import types as T

from .log import AddFile, SnapshotState
from .types import cast_partition_value

Predicate = tuple[str, str, Any]

_OPS = {"=", "==", "!=", "<", "<=", ">", ">=", "in"}


def _coerce(value: Any, dt: T.DataType) -> Any:
    """Coerce a predicate literal to the column's python-value domain."""
    import datetime

    if value is None:
        return None
    if isinstance(dt, (T.DateType,)) and isinstance(value, str):
        return datetime.date.fromisoformat(value)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)) and isinstance(value, str):
        return datetime.datetime.fromisoformat(value)
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(value)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(value)
    return value


def _stats_value(stats: dict | None, section: str, column: str) -> Any:
    if not stats:
        return None
    sec = stats.get(section)
    if not isinstance(sec, dict):
        return None
    return sec.get(column)


def _file_matches_partition(
    f: AddFile, schema_types: dict[str, T.DataType], pred: Predicate
) -> bool:
    """False only when the file's partition value provably fails `pred`."""
    col, op, val = pred
    raw = f.partition_values.get(col)
    dt = schema_types[col]
    pv = cast_partition_value(raw, dt)
    if op == "in":
        # NULL IN (...) is never TRUE under SQL three-valued logic, so a
        # NULL-partition file provably holds no matching row — exact, not
        # just conservative (metadata-only count()/min_max() rely on this).
        if pv is None:
            return False
        vals = [_coerce(v, dt) for v in val]
        return pv in vals
    cv = _coerce(val, dt)
    if cv is None:
        # ('col', '=', None) is the null-safe IS NULL predicate
        # (dml._normalize_where builds eqNullSafe for it); every other op
        # compared to NULL yields NULL -> no row matches.
        return op in {"=", "=="} and pv is None
    if pv is None:
        # NULL <op> literal is NULL for every comparison op including !=
        # (SQL 3VL): the file provably contains no matching row.
        return False
    if op in {"=", "=="}:
        return pv == cv
    if op == "!=":
        return pv != cv
    if op == "<":
        return pv < cv
    if op == "<=":
        return pv <= cv
    if op == ">":
        return pv > cv
    if op == ">=":
        return pv >= cv
    return True


def _file_matches_stats(
    f: AddFile, schema_types: dict[str, T.DataType], pred: Predicate
) -> bool:
    """False only when min/max/nullCount stats PROVE no row matches."""
    col, op, val = pred
    dt = schema_types[col]
    mn = _coerce(_stats_value(f.stats, "minValues", col), dt)
    mx = _coerce(_stats_value(f.stats, "maxValues", col), dt)
    if op == "in":
        if mn is None or mx is None:
            return True
        vals = [_coerce(v, dt) for v in val]
        return any(v is not None and mn <= v <= mx for v in vals)
    cv = _coerce(val, dt)
    if cv is None or mn is None or mx is None:
        return True  # can't prove anything
    try:
        if op in {"=", "=="}:
            return mn <= cv <= mx
        if op == "<":
            return mn < cv
        if op == "<=":
            return mn <= cv
        if op == ">":
            return mx > cv
        if op == ">=":
            return mx >= cv
    except TypeError:
        return True  # incomparable types: keep the file
    return True  # != can't be proven false by min/max alone (unless mn==mx==cv)


def prune_files(
    snapshot: SnapshotState, predicates: Iterable[Predicate] | None
) -> list[AddFile]:
    """Return the subset of live files that can possibly match all predicates.

    Partition-column predicates prune on `partitionValues` (exact);
    data-column predicates prune on per-file min/max stats (conservative).
    """
    preds: Sequence[Predicate] = list(predicates or [])
    for col, op, _ in preds:
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op: {op!r}")
    if not preds:
        return snapshot.files
    schema_types = {f.name: f.dataType for f in snapshot.schema.fields}
    part_cols = set(snapshot.partition_columns)
    out = []
    for f in snapshot.files:
        keep = True
        for pred in preds:
            col = pred[0]
            if col not in schema_types:
                continue
            if col in part_cols:
                if not _file_matches_partition(f, schema_types, pred):
                    keep = False
                    break
            else:
                if not _file_matches_stats(f, schema_types, pred):
                    keep = False
                    break
        if keep:
            out.append(f)
    return out
