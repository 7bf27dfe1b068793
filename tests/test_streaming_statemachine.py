"""Randomized STREAMING state machine: the cross-feature interaction net
pointed at the Delta streaming source.

A seeded random walk interleaves writer ops — multi-file appends, COW/MOR
DELETE and UPDATE, TRUNCATE, OPTIMIZE (dataChange=false), checkpoint,
RESTORE — with stream triggers driven through the EXACT engine protocol
Spark's microbatch engine uses against the Python DataSource API
(latestOffset -> partitions(start, end) -> commit(end); on restart, replay
partitions()/commit() of the last planned batch — the protocol verified
empirically in test_deltapond_source and documented in
deltapond_source.py). Driving DeltaPondStreamReader directly instead of
through writeStream keeps a 16-step walk at Python speed, so many seeds x
both planning planes x three reader modes fit in CI; the real-engine
integration itself is pinned by the scenario tests in
test_deltapond_source.py.

The per-trigger oracle is OP-AGNOSTIC and independent of the reader: a
commit's expected emission is derived from the raw commit JSON (dataChange
add actions in stable order, sliced by the offsets the reader returned)
plus a direct pyarrow read of each add file minus its deletion-vector
positions. RESTORE/TRUNCATE/OPTIMIZE therefore need no special-casing in
the model — whatever commit shape an op writes is what the model predicts
from, which is exactly the contract the reader itself must honor.

What only this composition can catch (vs the per-feature scenario tests):
admission caps splitting a commit whose NEXT commit is a skipChangeCommits
zero-cost skip, RESTORE re-adding DV'd files mid-stream under
ignoreChanges, a crash-restart landing mid-commit right after a TRUNCATE,
CDF-mode caps admitting whole commits across a MOR-delete/RESTORE
sequence on the light plane, ...

Modes per seed: ignoreChanges (re-emission semantics), skipChangeCommits
(silent skip semantics), readChangeFeed (streaming CDF — cross-checked
per window against cdf.table_changes, which the DML state machine pins
against an independent pandas model on both planes). Runs on both
planning planes: non-CDF partitions() only reads commit JSONs, but the
CDF mode's _RangeTracker base probe routes through LightSnapshot past the
threshold.
"""

import json
import os
import random

import pytest

# slow tier (round-12): randomized walks / fuzz soaks — deselected by
# the default fast tier (see pytest.ini); the full tier runs them all
pytestmark = pytest.mark.slow

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.deletion_vectors import read_dv_positions
from athena_delta_lake_spark.delta.dml import truncate_table
from athena_delta_lake_spark.delta.log import DeltaLog, _decode_path
from athena_delta_lake_spark.delta.writer import write_checkpoint
from athena_delta_lake_spark.sources.deltapond_source import (
    DeltaPondStreamReader,
)

# ------------------------------------------------------------- the oracle


def _commit_profile(path: str, v: int):
    """(dataChange add actions in the stable order of the commit JSON,
    whether the commit carries dataChange removes) — read directly from
    the raw log, independent of DeltaLog/commit_actions."""
    adds, has_dc_removes = [], False
    with open(os.path.join(path, "_delta_log", f"{v:020d}.json")) as f:
        for line in f:
            a = json.loads(line)
            if "add" in a and a["add"].get("dataChange", True):
                adds.append(a["add"])
            elif "remove" in a and a["remove"].get("dataChange", True):
                has_dc_removes = True
    return adds, has_dc_removes


def _surviving_ids(path: str, add: dict) -> list[int]:
    """ids physically in an add file minus its DV'd positions — what a
    stream emitting this add must produce, read via pyarrow directly."""
    import pyarrow.parquet as pq

    fp = os.path.join(path, _decode_path(add["path"]))
    ids = pq.read_table(fp, columns=["id"]).column("id").to_pylist()
    dv = add.get("deletionVector")
    if dv:
        dead = set(read_dv_positions(path, dv))
        ids = [x for i, x in enumerate(ids) if i not in dead]
    return [int(x) for x in ids]


def _expected_window(path: str, start, end, mode: str) -> list[int]:
    """Expected emitted ids for the batch (start, end] under the given
    reader mode, honoring mid-commit slicing exactly as partitions()
    documents it (same offsets -> same stable-order slice)."""
    (sv, si), (ev, ei) = start, end
    out: list[int] = []
    first_v = sv if si is not None else sv + 1
    for v in range(first_v, ev + 1):
        adds, has_rm = _commit_profile(path, v)
        if has_rm and mode == "skip":
            continue  # skipChangeCommits: change commits vanish wholesale
        # ignoreChanges: delete-only commits emit nothing (no adds),
        # rewrite commits re-emit their add files' surviving rows
        lo = si if (v == sv and si is not None) else 0
        hi = ei if (v == ev and ei is not None) else len(adds)
        for a in adds[lo:hi]:
            out.extend(_surviving_ids(path, a))
    return out


def _window_files(path: str, start, end, mode: str) -> int:
    """Data files the window admits (skip-mode change commits cost 0) —
    the unit maxFilesPerTrigger budgets."""
    (sv, si), (ev, ei) = start, end
    n = 0
    first_v = sv if si is not None else sv + 1
    for v in range(first_v, ev + 1):
        adds, has_rm = _commit_profile(path, v)
        if has_rm and mode == "skip":
            continue
        lo = si if (v == sv and si is not None) else 0
        hi = ei if (v == ev and ei is not None) else len(adds)
        n += hi - lo
    return n


# ------------------------------------------------- manual microbatch engine


def _key(pos):
    v, i = pos
    return (v, float("inf") if i is None else i)


class _Engine:
    """The microbatch protocol against a DataSourceStreamReader, with
    crash-restart injection. Restart == a fresh reader instance (new
    worker process) followed by the engine's WAL recovery: replay
    partitions()/commit() of the last PLANNED batch (committed or not),
    exactly as MicroBatchExecution does against this API."""

    def __init__(self, path, options, schema):
        self._path = path
        self._options = options
        self._schema = schema
        self.reader = DeltaPondStreamReader(dict(options), schema)
        self.committed = self.reader._parse_offset(self.reader.initialOffset())
        self.last_batch = None  # (start, end, ids) of the last planned batch

    def _read_batch(self, start, end) -> list[int]:
        parts = self.reader.partitions(
            self.reader._to_offset(start), self.reader._to_offset(end)
        )
        ids = []
        for p in parts:
            for batch in self.reader.read(p):
                names = batch.schema.names
                col = "id" if "id" in names else names[0]
                ids.extend(int(x) for x in batch.column(col).to_pylist())
        return ids

    def trigger(self) -> tuple | None:
        """One microbatch: returns (start, end, emitted ids) or None when
        the source reports no new data."""
        end = self.reader._parse_offset(self.reader.latestOffset())
        if _key(end) <= _key(self.committed):
            return None
        start = self.committed
        ids = self._read_batch(start, end)
        self.reader.commit(self.reader._to_offset(end))
        self.committed = end
        self.last_batch = (start, end, ids)
        return (start, end, ids)

    def crash_restart(self):
        """Kill the worker, recover from the WAL: fresh reader, replay of
        the last planned batch. Asserts the replay is byte-for-byte the
        original emission (exactly-once across restarts)."""
        self.reader = DeltaPondStreamReader(dict(self._options), self._schema)
        if self.last_batch is not None:
            start, end, ids = self.last_batch
            replayed = self._read_batch(start, end)
            assert sorted(replayed) == sorted(ids), (
                f"restart replay of ({start}, {end}] diverged: "
                f"{sorted(replayed)[:10]}... vs {sorted(ids)[:10]}..."
            )
            self.reader.commit(self.reader._to_offset(end))


# ---------------------------------------------------------------- the walk

_SEEDS = [5, 18, 27, 41, 76, 94]  # 2 seeds per reader mode (seed % 3)
_SEEDS += [
    int(s)
    for s in os.environ.get("ADLS_STREAM_EXTRA_SEEDS", "").split(",")
    if s.strip()
]


@pytest.mark.parametrize("seed", _SEEDS)
def test_random_stream_walk_matches_commit_oracle(spark, tmp_path, seed, plane):
    rng = random.Random(seed)
    path = str(tmp_path / f"swalk_{seed}")
    mode = ("ignorechanges", "skip", "cdf")[seed % 3]
    partitioned = seed % 2 == 0

    next_id = 0

    def fresh(n):
        nonlocal next_id
        rows = [
            (next_id + i, (next_id + i) % 3, float(next_id + i))
            for i in range(n)
        ]
        next_id += n
        return rows

    write_delta(
        spark.createDataFrame(fresh(12), "id long, k long, v double"),
        path,
        partition_by=["k"] if partitioned else None,
    )
    if plane == "light":
        from conftest import force_light_engaged

        force_light_engaged(path)

    options = {"path": path, "startingVersion": 0}
    if mode == "ignorechanges":
        options["ignoreChanges"] = "true"
    elif mode == "skip":
        options["skipChangeCommits"] = "true"
    else:
        options["readChangeFeed"] = "true"
    # random admission caps: None (unbounded) or tight enough to split /
    # bound real batches at this scale
    cap_style = rng.choice(["none", "files", "bytes", "commits"])
    if cap_style == "files" and mode != "cdf":
        options["maxFilesPerTrigger"] = str(rng.choice([1, 2, 3]))
    elif cap_style == "bytes" and mode != "cdf":
        options["maxBytesPerTrigger"] = str(rng.choice([1, 2000]))
    elif cap_style == "commits":
        options["maxCommitsPerTrigger"] = str(rng.choice([1, 2]))

    snap_schema = DeltaTable(spark, path).to_df().schema
    if mode == "cdf":
        import pyspark.sql.types as T

        snap_schema = T.StructType(
            list(snap_schema.fields)
            + [
                T.StructField("_change_type", T.StringType(), True),
                T.StructField("_commit_version", T.LongType(), True),
            ]
        )
    eng = _Engine(path, options, snap_schema)
    max_files = int(options.get("maxFilesPerTrigger", 0)) or None

    emitted: list[int] = []
    expected: list[int] = []
    cdf_lo = 0  # next version the CDF cross-check window starts at

    def run_triggers(n):
        nonlocal emitted
        for _ in range(n):
            latest = DeltaLog(path).latest_version()
            backlog = _key((latest, None)) > _key(eng.committed)
            got = eng.trigger()
            if got is None:
                assert not backlog, (
                    f"stall: committed {eng.committed} but table is at "
                    f"v{latest} with pending data"
                )
                return
            start, end, ids = got
            # stall-freedom: a trigger with backlog must advance
            assert _key(end) > _key(start)
            if mode == "cdf":
                _check_cdf_window(start, end, ids)
            else:
                want = _expected_window(path, start, end, mode)
                assert sorted(ids) == sorted(want), (
                    f"seed {seed} window ({start}, {end}]: emitted "
                    f"{sorted(ids)} != expected {sorted(want)}"
                )
                if max_files is not None:
                    assert (
                        _window_files(path, start, end, mode) <= max_files
                    ), f"window ({start}, {end}] exceeds maxFilesPerTrigger"
                expected.extend(want)
                emitted = emitted + ids
            if rng.random() < 0.25:
                eng.crash_restart()

    def _check_cdf_window(start, end, ids):
        """Streaming CDF must agree with the batch table_changes TVF over
        the same commit window (the TVF itself is pinned against an
        independent pandas model by the DML state machine). CDF-mode
        offsets never split commits, so windows are whole versions."""
        from athena_delta_lake_spark.delta.cdf import table_changes

        (sv, si), (ev, ei) = start, end
        assert si is None and ei is None, "CDF admission split a commit"
        want = [
            int(r.id)
            for r in table_changes(spark, path, sv + 1, ev)
            .select("id")
            .collect()
        ]
        assert sorted(ids) == sorted(want), (
            f"streaming CDF window ({start}, {end}] != table_changes: "
            f"{sorted(ids)[:10]}... vs {sorted(want)[:10]}..."
        )

    run_triggers(1)  # drain the initial load

    for step in range(14):
        op = rng.choice(
            [
                "append", "append_multi", "delete_cow", "delete_mor",
                "update_cow", "update_mor", "truncate", "optimize",
                "checkpoint", "restore",
            ]
        )
        t = DeltaTable(spark, path)
        if op == "append":
            write_delta(
                spark.createDataFrame(
                    fresh(rng.randint(2, 6)), "id long, k long, v double"
                ),
                path,
                mode="append",
            )
        elif op == "append_multi":
            # several add actions in one commit: the unit file/byte caps
            # split and mid-commit restart offsets index into
            df = spark.createDataFrame(
                fresh(rng.randint(6, 10)), "id long, k long, v double"
            ).repartition(3)
            write_delta(df, path, mode="append")
        elif op == "delete_cow":
            t.delete(where=f"id % 7 = {rng.randint(0, 6)}", mode="cow")
        elif op == "delete_mor":
            t.delete(where=f"id % 5 = {rng.randint(0, 4)}", mode="mor")
        elif op == "update_cow":
            t.update({"v": "v + 1000"}, where=f"k = {rng.randint(0, 2)}")
        elif op == "update_mor":
            t.update(
                {"v": "v + 1000"},
                where=f"k = {rng.randint(0, 2)}",
                mode="mor",
            )
        elif op == "truncate":
            truncate_table(path)
        elif op == "optimize":
            t.compact(target_file_size=1 << 30)
        elif op == "checkpoint":
            write_checkpoint(path)
        elif op == "restore":
            lv = DeltaLog(path).latest_version()
            target = rng.randint(max(0, lv - 4), lv)
            t.restore(version=target)
        DeltaLog.clear_cache()
        run_triggers(rng.randint(0, 2))

    # final drain: bounded triggers until the source reports caught-up
    for _ in range(200):
        if eng.trigger() is None:
            break
        if mode == "cdf":
            s, e, ids = eng.last_batch
            _check_cdf_window(s, e, ids)
        else:
            s, e, ids = eng.last_batch
            want = _expected_window(path, s, e, mode)
            assert sorted(ids) == sorted(want)
            expected.extend(want)
            emitted = emitted + ids
    else:
        pytest.fail("stream did not drain in 200 triggers")

    latest = DeltaLog(path).latest_version()
    assert eng.committed[0] == latest and eng.committed[1] is None, (
        f"drained stream stuck at {eng.committed}, table at v{latest}"
    )
    if mode != "cdf":
        # exactly-once over the whole walk, restarts included: the
        # concatenation of per-window oracles IS the total emission
        assert sorted(emitted) == sorted(expected)

        # real-engine capstone: a genuine availableNow replay of the FULL
        # history through spark.readStream must equal the oracle's
        # full-window expectation — tying the manual-engine protocol to
        # the actual microbatch engine on the same randomized table
        from athena_delta_lake_spark.sources.deltapond_source import (
            register,
        )

        register(spark)
        qname = f"swalk_sink_{seed}_{plane}"
        rs = (
            spark.readStream.format("deltapond")
            .option("startingVersion", 0)
            .option("availableNow", "true")
        )
        if mode == "ignorechanges":
            rs = rs.option("ignoreChanges", "true")
        else:
            rs = rs.option("skipChangeCommits", "true")
        q = (
            rs.load(path)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive
        want_full = _expected_window(
            path,
            (-1, None),
            (DeltaLog(path).latest_version(), None),
            mode,
        )
        got_full = [
            int(r.id) for r in spark.sql(f"select id from {qname}").collect()
        ]
        assert sorted(got_full) == sorted(want_full), (
            f"real-engine availableNow replay diverged from the oracle: "
            f"{len(got_full)} vs {len(want_full)} rows"
        )
