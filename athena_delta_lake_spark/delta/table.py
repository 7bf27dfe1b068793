"""DeltaTable: the user-facing handle on one metastore-less Delta table.

Bundles log replay (log.py), file pruning (stats.py), scan (reader.py) and
write (writer.py) behind one object — the in-process equivalent of the
reference's per-table request cycle GetTable -> GetTableLayout -> GetSplits
-> ReadRecords (/root/reference/DeltaMetadataHandler.scala:90-185,
DeltaRecordHandler.scala:116-155), minus the Lambda boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .features import _explicit_feature_sets
from .log import DeltaLog, SnapshotState
from .reader import read_snapshot
from .stats import Predicate, prune_files_auto
from .writer import write_checkpoint, write_delta


def _partition_only(preds: list[Predicate], snap: SnapshotState) -> bool:
    pc = set(snap.partition_columns)
    return bool(preds) and all(p[0] in pc for p in preds)


def _parse_where(expr: str) -> list[Predicate]:
    """Best-effort: extract `col op literal` conjuncts from a SQL boolean
    string for FILE pruning. Pruning is an optimization, so conjuncts that
    don't match the simple form (functions, OR branches, subexpressions)
    are skipped — exactness comes from the row filter applied afterwards.
    """
    return _parse_where_full(expr)[0]


import re as _re

_CONJ_RE = None  # compiled lazily (with _IN_RE and the literal regexes)
_LIT_FAIL = object()


def _compile_where_res():
    global _CONJ_RE, _IN_RE, _TYPED_STR_RE, _STR_RE, _INT_RE, _NUM_RE, _BOOL_RE
    ident = r"(?:`([^`]+)`|(\w+))"
    # == before =: first-match alternation would otherwise eat one '='
    # of a '==' and leave an unparseable '= literal' value
    _CONJ_RE = _re.compile(
        rf"^\s*{ident}\s*(==|=|!=|<>|<=|>=|<|>)\s*(.+?)\s*$", _re.S
    )
    _IN_RE = _re.compile(rf"^\s*{ident}\s+IN\s*\((.+)\)\s*$", _re.I | _re.S)
    # string bodies allow SQL '' doubling and Catalyst's backslash escapes
    body = r"((?:[^'\\]|\\.|'')*)"
    _TYPED_STR_RE = _re.compile(
        rf"^(?:DATE|TIMESTAMP_NTZ|TIMESTAMP)\s*'{body}'$", _re.I
    )
    _STR_RE = _re.compile(rf"^'{body}'$")
    _INT_RE = _re.compile(r"^[+-]?\d+[LSY]?$", _re.I)
    _NUM_RE = _re.compile(
        r"^[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?(?:BD|D|F)?$", _re.I
    )
    _BOOL_RE = _re.compile(r"^(?:true|false)$", _re.I)


def _skip_string(s: str, i: int) -> int:
    """Index just past the string literal opening at s[i] == \"'\"
    (honors \\-escapes and '' doubling)."""
    j = i + 1
    n = len(s)
    while j < n:
        if s[j] == "\\":
            j += 2
            continue
        if s[j] == "'":
            if j + 1 < n and s[j + 1] == "'":
                j += 2
                continue
            return j + 1
        j += 1
    return n


def _unescape_str(body: str):
    """Decode a string-literal body. Catalyst's Column.sql() renders
    embedded quotes as \\' (and backslashes as \\\\); hand-written SQL
    uses '' doubling. Any OTHER backslash escape (\\n, \\t, unicode)
    fails the parse — guessing a value here would prune files that hold
    matching rows."""
    if "\\" not in body:
        return body.replace("''", "'")
    out = []
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if ch == "\\":
            if i + 1 < n and body[i + 1] in ("'", "\\"):
                out.append(body[i + 1])
                i += 2
                continue
            return _LIT_FAIL
        if ch == "'":  # must be '' doubling
            out.append("'")
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_literal(raw: str):
    """One SQL literal -> python value, or _LIT_FAIL. Covers the forms
    Catalyst's Column.sql() renders (the pond.sql DML routes pass
    rendered condition text): suffixed numerics (5L, 1.5BD, 2D),
    DATE/TIMESTAMP '...' typed strings (the value is the inner string —
    the prune evaluators coerce by column type with the same session-
    zone cast semantics the row filter's literal gets), booleans, plus
    the plain forms hand-written API conditions use."""
    raw = raw.strip()
    m = _TYPED_STR_RE.match(raw) or _STR_RE.match(raw)
    if m:
        return _unescape_str(m.group(1))
    if _INT_RE.match(raw):
        return int(_re.sub(r"[LSY]$", "", raw, flags=_re.I))
    if _NUM_RE.match(raw):
        digits = _re.sub(r"(?:BD|D|F)$", "", raw, flags=_re.I)
        f = float(digits)
        # round-trip guard: a decimal literal float() cannot represent
        # exactly (> ~15 significant digits) must NOT become a pruning
        # value — against a DECIMAL column the rounded float would prune
        # files that hold exactly-matching rows. Conservative bail; the
        # row filter still evaluates the original text exactly.
        import decimal

        try:
            if decimal.Decimal(digits) != decimal.Decimal(str(f)):
                return _LIT_FAIL
        except decimal.InvalidOperation:
            return _LIT_FAIL
        return f
    if _BOOL_RE.match(raw):
        return raw.lower() == "true"
    return _LIT_FAIL


def _strip_outer_parens(s: str) -> str:
    """Strip parens that wrap the WHOLE expression (string-aware: parens
    inside quoted literals don't count), repeatedly."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        i = 0
        n = len(s)
        wraps = False
        while i < n:
            ch = s[i]
            if ch == "'":
                i = _skip_string(s, i)
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    wraps = i == n - 1
                    break
            i += 1
        if not wraps:
            break
        s = s[1:-1].strip()
    return s


def _split_top_and(s: str):
    """Split on top-level ANDs (outside parens and string literals).
    Returns None when a top-level OR is present — a disjunction can't be
    pruned conjunct-by-conjunct."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    i = 0
    n = len(s)

    def _word_at(k: int, w: str) -> bool:
        if s[k : k + len(w)].upper() != w:
            return False
        before_ok = k == 0 or not (s[k - 1].isalnum() or s[k - 1] == "_")
        e = k + len(w)
        after_ok = e >= n or not (s[e].isalnum() or s[e] == "_")
        return before_ok and after_ok

    while i < n:
        ch = s[i]
        if ch == "'":
            j = _skip_string(s, i)
            buf.append(s[i:j])
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0:
            if _word_at(i, "AND"):
                parts.append("".join(buf))
                buf.clear()
                i += 3
                continue
            if _word_at(i, "OR"):
                return None
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _split_top_commas(s: str) -> list[str]:
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = _skip_string(s, i)
            buf.append(s[i:j])
            i = j
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf.clear()
            i += 1
            continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return parts


def _parse_where_full(expr: str) -> tuple[list[Predicate], bool]:
    """(preds, fully_parsed). fully_parsed is True only when EVERY leaf
    of a pure-AND expression matched the simple `col op literal` /
    `col IN (literals)` form — the precondition for answering from
    metadata alone (a dropped conjunct like `id % 2 = 1` would otherwise
    silently inflate a metadata count or widen a wholesale delete).

    The grammar covers BOTH hand-written API conditions and the text
    Catalyst's Column.sql() renders for the pond.sql DML routes — every
    node parenthesized, identifiers backticked, literals suffixed
    (1.5BD) or typed (DATE '...'). Before round 9 the rendered form
    failed the conjunct regex wholesale, so every SQL-route
    DELETE/UPDATE lost file pruning entirely (a full-table probe below
    the light-planning threshold, a classic snapshot replay past it).
    An OR under a pure-AND ancestor poisons only its own subtree: its
    siblings remain true conjuncts of the whole expression and still
    prune (fully=False keeps the metadata-only paths off)."""
    if _CONJ_RE is None:
        _compile_where_res()
    preds: list[Predicate] = []
    fully = _collect_conjuncts(str(expr), preds)
    return preds, fully


def _collect_conjuncts(s: str, preds: list[Predicate]) -> bool:
    stripped = _strip_outer_parens(s)
    parts = _split_top_and(stripped)
    if parts is None:
        return False  # top-level OR
    fully = True
    for part in parts:
        p = _strip_outer_parens(part)
        m = _CONJ_RE.match(p)
        if m:
            col = m.group(1) or m.group(2)
            val = _parse_literal(m.group(4))
            if val is not _LIT_FAIL:
                op = m.group(3)
                preds.append((col, "!=" if op == "<>" else op, val))
                continue
        m = _IN_RE.match(p)
        if m:
            col = m.group(1) or m.group(2)
            vals = [
                _parse_literal(v) for v in _split_top_commas(m.group(3))
            ]
            if vals and all(v is not _LIT_FAIL for v in vals):
                preds.append((col, "in", vals))
                continue
        if p != part.strip():
            # parens were stripped: a strictly smaller subexpression —
            # recurse so `(a = 1 AND b = 2) AND c = 3` yields all three
            fully = _collect_conjuncts(p, preds) and fully
            continue
        fully = False
    return fully


class DeltaTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.log = DeltaLog(self.path, spark)

    # -- metadata (reference: doGetTable, DeltaMetadataHandler.scala:90-107)
    def snapshot(self, version: int | None = None) -> SnapshotState:
        return self.log.snapshot(version)

    def snapshot_light(self, version: int | None = None):
        """Driver-light snapshot for the 10^7+ file regime: the header
        replays without materializing checkpoint AddFiles; file metadata
        is consumed via files_df()/prune_df() where executors read the
        checkpoint parquet (log.LightSnapshot)."""
        return self.log.snapshot_light(version)

    def schema(self, version: int | None = None) -> T.StructType:
        return self.snapshot(version).schema

    def partition_columns(self) -> list[str]:
        # header-only fact: light state past the threshold, classic below
        from .writer import _header_state

        return _header_state(self.path).partition_columns

    def version(self) -> int:
        return self.log.latest_version()

    # -- layout/splits (reference: getPartitions + doGetSplits, :109-185)
    def pruned_files(
        self, predicates: list[Predicate] | None = None, version: int | None = None
    ):
        return prune_files_auto(self.spark, self.snapshot(version), predicates)

    def _planning_snapshot(
        self,
        predicates: list[Predicate] | None,
        version: int | None = None,
    ) -> SnapshotState:
        """The snapshot scans plan against. Below the light-planning
        threshold (log.light_planning_threshold, default 10^6 files by
        `_last_checkpoint`): the ordinary classic snapshot. Above it: the
        driver-light path — header-only replay, predicate pruning runs
        EXECUTOR-side over the checkpoint parquet, and only the pruned
        survivors are materialized as AddFiles (measured at 10^7 adds:
        1.2 s / 123 MiB RSS vs 270 s / 8.6 GiB classic, identical
        survivors — PERF_TRIAGE_r7). Falls back to classic when the
        predicate leaves more than log.light_collect_cap survivors."""
        from .log import light_collect_cap

        if self.log.light_planning_engaged(version):
            light = self.log.snapshot_light(version)
            files = light.collect_pruned_add_files(
                self.spark, predicates, cap=light_collect_cap()
            )
            if files is not None:
                return light.to_snapshot_state(files)
        return self.snapshot(version)

    # -- scan (reference: readWithConstraint, DeltaRecordHandler.scala:116-155)
    def to_df(
        self,
        predicates: list[Predicate] | None = None,
        columns: list[str] | None = None,
        version: int | None = None,
        where: list[Predicate] | str | None = None,
    ) -> DataFrame:
        """Scan the snapshot.

        `predicates`: file-level pruning ONLY (partition values + stats) —
        rows from surviving files are NOT re-filtered.
        `where`: exact semantics — prunes files AND applies the equivalent
        row filter (the common case; supersedes `predicates`). Either a
        predicate-tuple list or a SQL boolean string; for a string, simple
        `col op literal` conjuncts drive file pruning and the full
        expression is applied as the row filter.
        """
        if isinstance(where, str):
            preds = _parse_where(where)
            df = read_snapshot(
                self.spark, self._planning_snapshot(preds, version), preds,
                columns,
            )
            return df.filter(where)
        preds = where if where is not None else predicates
        df = read_snapshot(
            self.spark, self._planning_snapshot(preds, version), preds, columns
        )
        if where:
            from pyspark.sql import functions as F

            from .stats import _typed_lit

            types = {f_.name: f_.dataType for f_ in df.schema.fields}
            for col, op, val in where:
                c = F.col(col)
                dt = types.get(col)
                if op == "in":
                    # datetime elements route through _typed_lit one by
                    # one (isin would ride pyspark's OS-zone conversion)
                    import datetime as _dtm

                    if any(isinstance(x, _dtm.datetime) for x in val):
                        cond = F.lit(False)
                        for x in val:
                            cond = cond | (c == _typed_lit(x, dt))
                    else:
                        cond = c.isin(list(val))
                    df = df.filter(cond)
                    continue
                # _typed_lit keeps datetime literals OS-independent
                # (session-zone for naive, absolute for aware) — the SAME
                # interpretation file pruning used, so the row filter can
                # never keep a row pruning's file-level answer dropped
                v = None if val is None else _typed_lit(val, dt)
                if op in {"=", "=="}:
                    cond = c.isNull() if val is None else (c == v)
                elif op == "!=":
                    cond = c != v
                elif op == "<":
                    cond = c < v
                elif op == "<=":
                    cond = c <= v
                elif op == ">":
                    cond = c > v
                elif op == ">=":
                    cond = c >= v
                else:
                    raise ValueError(f"unsupported op: {op!r}")
                df = df.filter(cond)
        return df

    def count(
        self,
        version: int | None = None,
        where: list[Predicate] | str | None = None,
    ) -> int:
        """Row count, O(metadata) wherever the log can answer it — at
        100 TB this is milliseconds of driver time vs a full-table scan.

        No predicate: sum of per-file numRecords stats minus deletion-
        vector cardinalities. Partition-only predicates: the same sum over
        the exactly-pruned file set (every row of a surviving file shares
        its partition values, so no row-level filtering is needed). Files
        missing stats — or whose partition values can't decide the
        predicate — are scanned individually; data-column predicates fall
        back to a normal filtered scan.
        """
        from .reader import read_files

        if self.log.light_planning_engaged(version):
            n = self._count_light(version, where)
            if n is not None:
                return n
        snap = self.snapshot(version)
        preds: list[Predicate] | None
        if isinstance(where, str):
            preds, fully = _parse_where_full(where)
            # metadata-only counting needs the WHOLE expression captured
            # as partition predicates — a dropped conjunct (id % 2 = 1)
            # would silently inflate the count
            if not preds or not fully or not _partition_only(preds, snap):
                return self.to_df(version=version, where=where).count()
            files = prune_files_auto(self.spark, snap, preds)
        elif where:
            preds = list(where)
            if not _partition_only(preds, snap):
                return self.to_df(version=version, where=where).count()
            files = prune_files_auto(self.spark, snap, preds)
        else:
            files = snap.files
        total = 0
        scan_files = []
        for f in files:
            n = (f.stats or {}).get("numRecords")
            if n is None:
                scan_files.append(f)
                continue
            total += int(n)
            if f.deletion_vector:
                total -= int(f.deletion_vector.get("cardinality", 0))
        if scan_files:
            df = read_files(self.spark, snap, scan_files)
            if isinstance(where, str):
                df = df.filter(where)
            total += df.count()
        return total

    def _count_light(self, version, where) -> int | None:
        """Driver-light metadata count: numRecords minus DV cardinality
        summed EXECUTOR-side over the (pruned) files_df — the driver never
        sees a file list, so counting a 10^7-file table costs O(1) driver
        memory. Returns None to fall back classic when a predicate column
        sits outside the executor-prune's exact domain; data-column
        predicates route through to_df (itself light-planned). Stat-less
        survivors (no numRecords) are collected individually and scanned,
        exactly as the classic path does."""
        from pyspark.sql import functions as F

        from .log import light_collect_cap
        from .reader import read_files
        from .stats import _SAFE_PRUNE_TYPES

        light = self.log.snapshot_light(version)
        if isinstance(where, str):
            preds, fully = _parse_where_full(where)
            # same guard as the classic path: a metadata-only answer
            # needs the WHOLE expression captured as predicates
            if not preds or not fully:
                return self.to_df(version=version, where=where).count()
        elif where:
            preds = list(where)
        else:
            preds = None
        if preds:
            pc = set(light.partition_columns)
            types = {f.name: f.dataType for f in light.schema.fields}
            if not all(
                c in pc and isinstance(types.get(c), _SAFE_PRUNE_TYPES)
                for c, _op, _v in preds
            ):
                if any(c not in pc for c, _op, _v in preds):
                    # data predicate: exact row-level semantics via the
                    # (light-planned) filtered scan
                    return self.to_df(version=version, where=where).count()
                return None  # unsafe partition type: classic is exact
        df = light.prune_df(self.spark, preds, full=True)
        nr = F.get_json_object("stats", "$.numRecords").cast("long")
        agg = df.select(
            F.sum(nr).alias("nr"),
            F.sum(F.coalesce(F.col("dv_cardinality"), F.lit(0))).alias("dv"),
            F.count(F.lit(1)).alias("files"),
            F.count(nr).alias("with_stats"),
        ).collect()[0]
        total = int(agg["nr"] or 0) - int(agg["dv"] or 0)
        if agg["files"] > agg["with_stats"]:
            scan = light.collect_pruned_add_files(
                self.spark,
                cap=light_collect_cap(),
                full_df=df.filter(nr.isNull()),
            )
            if scan is None:
                return None
            sdf = read_files(self.spark, light.to_snapshot_state(scan), scan)
            if isinstance(where, str):
                sdf = sdf.filter(where)
            total += sdf.count()
        return total

    # -- write path (absent from the reference; SURVEY §2.C)
    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        partition_by: list[str] | None = None,
        replace_where: str | list | None = None,
    ) -> int:
        """replace_where (+ mode='overwrite'): selective overwrite — replace
        only predicate-matching rows (writer.write_delta replace_where)."""
        if partition_by is None:
            try:
                partition_by = self.partition_columns()
            except (FileNotFoundError, ValueError):
                partition_by = []
        return write_delta(
            df,
            self.path,
            mode=mode,
            partition_by=partition_by,
            replace_where=replace_where,
        )

    def checkpoint(self, parts: int | None = None, v2: bool = False) -> int:
        return write_checkpoint(self.path, parts=parts, v2=v2, spark=self.spark)

    # -- DML (absent from the reference; dml.py has the scale rationale)
    def delete(
        self, where, mode: str = "cow", isolation: str = "write_serializable"
    ) -> dict:
        """mode='cow' rewrites files without matched rows; mode='mor'
        writes deletion vectors (O(matched rows), purged by compact()).
        isolation='serializable' additionally refuses concurrent commits
        that ADDED rows matching the predicate (writer.commit_rewrite)."""
        from .dml import delete, delete_mor

        if mode in ("mor", "merge-on-read", "dv"):
            return delete_mor(self.spark, self.path, where, isolation=isolation)
        return delete(self.spark, self.path, where, isolation=isolation)

    def update(
        self,
        set: dict[str, str],
        where=None,
        mode: str = "cow",
        isolation: str = "write_serializable",
    ) -> dict:
        """mode='cow' rewrites candidate files; mode='mor' deletion-vectors
        the old row versions and appends only the updated rows."""
        from .dml import update, update_mor

        if mode in ("mor", "merge-on-read", "dv"):
            return update_mor(
                self.spark, self.path, set, where, isolation=isolation
            )
        return update(self.spark, self.path, set, where, isolation=isolation)

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        broadcast_keys: bool = True,
        when_matched: str = "update",
        when_not_matched: str | None = "insert",
        not_matched_by_source: str | None = None,
        matched_condition: str | None = None,
        mode: str = "cow",
        matched_clauses: list[tuple[str | None, str]] | None = None,
        schema_evolution: bool = False,
        isolation: str = "write_serializable",
        source_keys: list[str] | None = None,
        on_condition: str | None = None,
        not_matched_condition: str | None = None,
        not_matched_by_source_condition: str | None = None,
        not_matched_by_source_assigns: dict[str, str] | None = None,
    ) -> dict:
        """mode='cow' rewrites touched files; mode='mor' deletion-vectors
        matched target rows and appends only new row versions.
        matched_clauses: ordered (condition|None, 'update'|'delete') list,
        first-match-wins per target row (multi-clause WHEN MATCHED).
        schema_evolution: MERGE WITH SCHEMA EVOLUTION — source-only
        columns widen the target schema in the same commit.
        source_keys: differently-named equi-keys (ON t.id = s.src_id).
        on_condition: residual ON conjuncts over t./s. (cow mode only).
        not_matched_by_source: 'delete' | 'update' (with _assigns) | None;
        not_matched_by_source_condition gates it (SQL over t.<col> only —
        the retention idiom `AND t.ts < X`)."""
        from .dml import merge_upsert, merge_upsert_mor

        fn = (
            merge_upsert_mor
            if mode in ("mor", "merge-on-read", "dv")
            else merge_upsert
        )
        return fn(
            self.spark,
            self.path,
            source,
            keys,
            broadcast_keys,
            when_matched,
            when_not_matched,
            not_matched_by_source,
            matched_condition,
            matched_clauses=matched_clauses,
            schema_evolution=schema_evolution,
            isolation=isolation,
            source_keys=source_keys,
            on_condition=on_condition,
            not_matched_condition=not_matched_condition,
            not_matched_by_source_condition=not_matched_by_source_condition,
            not_matched_by_source_assigns=not_matched_by_source_assigns,
        )

    def compact(
        self,
        target_file_size: int = 128 * 1024 * 1024,
        predicates: list[Predicate] | None = None,
        zorder_by: list[str] | None = None,
    ) -> dict:
        from .dml import compact

        return compact(
            self.spark, self.path, target_file_size, predicates, zorder_by
        )

    def restore(
        self, version: int | None = None, timestamp_millis: int | None = None
    ) -> dict:
        from .dml import restore_table

        return restore_table(self.path, version, timestamp_millis)

    def vacuum(
        self, retention_hours: float | None = None, dry_run: bool = False
    ) -> dict:
        from .dml import vacuum

        return vacuum(self.path, retention_hours, dry_run, spark=self.spark)

    def history(self) -> list[dict]:
        """commitInfo per version (newest first)."""
        import json

        fs = self.log._fs
        out = []
        for v in range(self.version(), -1, -1):
            p = f"{self.log.log_dir}/{v:020d}.json"
            if not fs.exists(p):
                continue
            for line in fs.read_text(p).splitlines():
                a = json.loads(line)
                if "commitInfo" in a:
                    out.append({"version": v, **a["commitInfo"]})
                    break
        return out

    def add_columns(self, columns) -> int:
        """ALTER TABLE ADD COLUMNS (metadata-only; existing rows read NULL)."""
        from .writer import add_columns

        return add_columns(self.path, columns)

    def min_max(
        self,
        col: str,
        version: int | None = None,
        where: list[Predicate] | str | None = None,
    ) -> tuple:
        """(min, max) of a column, O(metadata) when the log can PROVE the
        answer: the candidate file set must be exact (no predicate, or
        partition-only predicates), and either `col` is a partition column
        (every surviving row shares the file's value — exact even under
        deletion vectors), or every candidate file carries min/max stats
        for `col`, has no deletion vector (a DV may have removed the
        extreme row), and the type is numeric/temporal (string footer
        stats may be truncated). Anything unprovable falls back to a scan.
        """
        import datetime  # noqa: F401  (coerced values)

        from pyspark.sql import functions as F

        from .log import typed_partition_values
        from .stats import _coerce, _stats_value

        snap = self.snapshot(version)

        def _scan() -> tuple:
            df = self.to_df(version=version, where=where)
            r = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
            return (r["mn"], r["mx"])

        preds: list[Predicate] | None = None
        if isinstance(where, str):
            preds, fully = _parse_where_full(where)
            # a dropped conjunct makes the candidate set inexact — the
            # metadata answer would cover the WHOLE partition (same guard
            # as count())
            if not preds or not fully or not _partition_only(preds, snap):
                return _scan()
        elif where:
            preds = list(where)
            if not _partition_only(preds, snap):
                return _scan()
        files = prune_files_auto(self.spark, snap, preds) if preds else snap.files
        if not files:
            return (None, None)
        dt = snap.schema[col].dataType
        if col in snap.partition_columns:
            vals = [
                typed_partition_values(f, snap.schema, [col])[0] for f in files
            ]
            vals = [v for v in vals if v is not None]
            return (min(vals), max(vals)) if vals else (None, None)
        if not isinstance(
            dt,
            (
                T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
                T.TimestampType, T.TimestampNTZType,
            ),
        ):
            return _scan()
        mns, mxs = [], []
        for f in files:
            if f.deletion_vector:
                return _scan()
            mn = _coerce(_stats_value(f.stats, "minValues", col), dt)
            mx = _coerce(_stats_value(f.stats, "maxValues", col), dt)
            if mn is None or mx is None:
                return _scan()
            mns.append(mn)
            mxs.append(mx)
        return (min(mns), max(mxs))

    def enable_row_tracking(self) -> int:
        from .writer import enable_row_tracking

        return enable_row_tracking(self.path)

    def to_df_with_row_ids(self, version: int | None = None) -> DataFrame:
        """Scan with STABLE `_row_id` / `_row_commit_version` columns
        (rowTracking): ids survive appends, deletion-vector DML,
        copy-on-write rewrites and OPTIMIZE."""
        from .reader import read_files_with_row_ids
        from .writer import _row_tracking_enabled

        snap = self.snapshot(version)
        if not _row_tracking_enabled(snap.metadata.get("configuration")):
            raise ValueError(
                "row tracking is not enabled; call enable_row_tracking()"
            )
        return read_files_with_row_ids(self.spark, snap, snap.files)

    def partitions(self, version: int | None = None) -> list[dict]:
        """SHOW PARTITIONS analog: the distinct typed partition-value
        combinations of the snapshot's live files — pure metadata, the
        same enumeration the reference served via GetTableLayout
        (/root/reference/DeltaMetadataHandler.scala:109-139), generalized
        to any partition schema."""
        from .log import typed_partition_values

        snap = self.snapshot(version)
        cols = list(snap.partition_columns)
        seen: dict[tuple, dict] = {}
        for f in snap.files:
            key = typed_partition_values(f, snap.schema, cols)
            seen.setdefault(key, dict(zip(cols, key)))
        return sorted(seen.values(), key=lambda d: tuple(str(v) for v in d.values()))

    def enable_column_mapping(self) -> int:
        from .writer import enable_column_mapping

        return enable_column_mapping(self.path)

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN (metadata-only; requires mapping)."""
        from .writer import rename_column

        return rename_column(self.path, old, new)

    def drop_column(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN (metadata-only; requires mapping)."""
        from .writer import drop_column

        return drop_column(self.path, name)

    def drop_feature(self, feature: str, truncate_history: bool = False) -> dict:
        """ALTER TABLE ... DROP FEATURE (protocol downgrade; see
        delta/features.py for the trace rules)."""
        from .features import drop_feature

        return drop_feature(self.path, feature, truncate_history, spark=self.spark)

    def clone(
        self, dst_path: str, version: int | None = None, shallow: bool = True
    ) -> "DeltaTable":
        """CREATE TABLE dst [SHALLOW] CLONE this [VERSION AS OF v]."""
        from .writer import clone_table

        clone_table(self.path, dst_path, version=version, shallow=shallow)
        return DeltaTable(self.spark, dst_path)

    def detail(self) -> dict:
        """DESCRIBE DETAIL analog: one dict of table facts from the
        current snapshot — no data I/O. Past the light-planning threshold
        the header facts come from the light state and the two file
        aggregates (numFiles / sizeInBytes) from one executor-side pass
        over files_df — DESCRIBE DETAIL on a 10^7-file table never builds
        the classic driver-resident file list."""
        if self.log.light_planning_engaged(None):
            from pyspark.sql import functions as F

            light = self.log.snapshot_light()
            agg = (
                light.files_df(self.spark)
                .agg(
                    F.count("*").alias("n"),
                    F.sum("size").alias("bytes"),
                )
                .collect()[0]
            )
            snap = light.to_snapshot_state([])
            num_files, size_bytes = int(agg["n"]), int(agg["bytes"] or 0)
        else:
            snap = self.snapshot()
            num_files = snap.num_files
            size_bytes = sum(f.size for f in snap.files)
        md = snap.metadata
        return {
            "format": (md.get("format") or {}).get("provider", "parquet"),
            "id": md.get("id"),
            "name": md.get("name"),
            "description": md.get("description"),
            "location": self.path,
            "createdAt": md.get("createdTime"),
            "partitionColumns": list(snap.partition_columns),
            "numFiles": num_files,
            "sizeInBytes": size_bytes,
            "properties": dict(md.get("configuration") or {}),
            "minReaderVersion": snap.protocol.get("minReaderVersion"),
            "minWriterVersion": snap.protocol.get("minWriterVersion"),
            "readerFeatures": snap.protocol.get("readerFeatures"),
            "writerFeatures": snap.protocol.get("writerFeatures"),
            # delta-spark's DESCRIBE DETAIL tableFeatures column: every
            # feature the protocol carries, legacy implications enumerated
            "tableFeatures": sorted(
                set.union(*_explicit_feature_sets(snap.protocol))
            ),
            "version": snap.version,
            "domainMetadata": dict(snap.domain_metadata),
            "clusteringColumns": self._clustering_columns(snap),
        }

    @staticmethod
    def _clustering_columns(snap) -> list[str]:
        import json as _json

        dm = snap.domain_metadata.get("delta.clustering")
        if not dm:
            return []
        try:
            return list(_json.loads(dm).get("clusteringColumns") or [])
        except (ValueError, TypeError):
            return []

    def set_domain_metadata(
        self,
        domain: str,
        configuration: str | None = None,
        removed: bool = False,
    ) -> int:
        from .writer import set_domain_metadata

        return set_domain_metadata(self.path, domain, configuration, removed)

    def table_changes(
        self,
        starting_version: int = 0,
        ending_version: int | None = None,
        include_timestamp: bool = False,
    ) -> "DataFrame":
        """Row-level changes between commits (see delta/cdf.py): adds
        `_change_type` and `_commit_version`, plus `_commit_timestamp`
        when include_timestamp is set."""
        from .cdf import table_changes

        return table_changes(
            self.spark, self.path, starting_version, ending_version,
            include_timestamp=include_timestamp,
        )
