"""Concurrent writers on the LIGHT plane (round-10 verdict #3).

The round-10 light routes replaced the per-file commute check with a
strict version-watermark OCC (writer.commit_streamed_removes /
_stream_commit) and introduced a streamed put-if-absent whose torn-commit
window was fixed late in the round. Until now every multi-writer race
test ran classic-plane only. These tests force the threshold and

- race real threads (blind appends vs full-table rewrites) at the
  filesystem on BOTH LocalFS and the HadoopFS facade: the loser always
  gets ConcurrentWriteError, the log stays gap-free, and every commit
  JSON parses completely (no torn line ever becomes visible);
- crash-inject a failing chunk iterable into fs.create_atomic_stream
  on both facades: the final commit path must NOT exist afterwards, no
  tmp sibling may linger loose in _delta_log (HadoopFS now stages under
  `_delta_log/.tmp/` like LocalFS — ADVICE r10), and a retry of the
  same version must succeed;
- pin the new bounded re-plan retry: a light TRUNCATE that loses the
  watermark race to ONE blind append re-plans once and lands (removing
  the racer's file too — truncate-after-append serialization), while
  losing twice still surfaces ConcurrentWriteError.
"""

import json
import os
import threading

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.dml import truncate_table
from athena_delta_lake_spark.delta.fs import get_fs
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import ConcurrentWriteError


@pytest.fixture(params=["local", "hadoop"])
def fs_mode(request, monkeypatch):
    if request.param == "hadoop":
        monkeypatch.setenv("ADLS_FORCE_HADOOP_FS", "1")
    DeltaLog.clear_cache()
    yield request.param
    DeltaLog.clear_cache()


def _mk_light(spark, path, monkeypatch, n=40):
    from conftest import force_light_engaged

    write_delta(
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(n)],
            "id long, k long, v double",
        ),
        path,
    )
    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    force_light_engaged(path)


def _assert_log_integrity(path):
    """Gap-free version sequence and every commit JSON parses line by
    line with a trailing newline — i.e. no torn or duplicated commit
    ever became visible."""
    log_dir = os.path.join(path, "_delta_log")
    versions = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f[0].isdigit()
    )
    assert versions == list(range(len(versions))), "log has gaps/duplicates"
    for v in versions:
        with open(os.path.join(log_dir, f"{v:020d}.json"), "rb") as f:
            raw = f.read()
        assert raw.endswith(b"\n"), f"commit {v} not newline-terminated"
        for line in raw.decode("utf-8").splitlines():
            json.loads(line)  # raises on a torn line
    # no stray streamed-commit tmp loose in _delta_log (staging lives
    # under _delta_log/.tmp, which VACUUM's sweep owns)
    loose = [
        f
        for f in os.listdir(log_dir)
        if ".tmp-" in f or ".stream-" in f
    ]
    assert not loose, f"orphaned tmp siblings in _delta_log: {loose}"
    return versions


def test_light_fullrewrite_vs_appends_threaded(
    spark, tmp_path, monkeypatch, fs_mode
):
    """Two real threads race at the filesystem past the threshold: one
    issues blind appends, the other TRUNCATEs and INSERT OVERWRITEs.
    Every surfaced failure is ConcurrentWriteError; afterwards the log
    is gap-free, every commit parses, and the final row count equals
    the model replayed from the commits' own operation sequence."""
    path = str(tmp_path / f"race_{fs_mode}")
    _mk_light(spark, path, monkeypatch)

    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def appender():
        barrier.wait()
        for j in range(6):
            try:
                write_delta(
                    spark.createDataFrame(
                        [(10_000 + j * 10 + i, 0, 1.0) for i in range(3)],
                        "id long, k long, v double",
                    ),
                    path,
                    mode="append",
                )
            except ConcurrentWriteError as e:
                errors.append(e)

    def rewriter():
        barrier.wait()
        for j in range(4):
            try:
                if j % 2 == 0:
                    truncate_table(path)
                else:
                    write_delta(
                        spark.createDataFrame(
                            [(j, 0, 0.0)], "id long, k long, v double"
                        ),
                        path,
                        mode="overwrite",
                    )
            except ConcurrentWriteError as e:
                errors.append(e)

    threads = [
        threading.Thread(target=appender),
        threading.Thread(target=rewriter),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
        assert not t.is_alive(), "writer deadlocked"

    versions = _assert_log_integrity(path)

    # ground-truth model replayed from the raw add/remove actions alone
    # (spec-level, independent of our snapshot code): final row count =
    # stats.numRecords summed over live files
    live: dict[str, int] = {}
    for v in versions:
        with open(
            os.path.join(path, "_delta_log", f"{v:020d}.json")
        ) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    live[a["add"]["path"]] = json.loads(
                        a["add"].get("stats") or "{}"
                    ).get("numRecords", 0)
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
    DeltaLog.clear_cache()
    assert DeltaTable(spark, path).to_df().count() == sum(live.values())


def test_streamed_commit_crash_injection(spark, tmp_path, fs_mode):
    """A chunk iterable that raises mid-stream must never leave a torn
    commit OR a loose tmp sibling; retrying the same version succeeds."""
    log_dir = str(tmp_path / "t" / "_delta_log")
    fs = get_fs(log_dir, spark)
    fs.mkdirs(log_dir)
    target = os.path.join(log_dir, f"{7:020d}.json")

    observed_during_stream: list[list[str]] = []

    def bad_chunks():
        yield b'{"commitInfo":{"operation":"X"}}\n'
        # capture what staging looks like WHILE the stream is open:
        # nothing may sit loose next to the target (HadoopFS used to
        # stage `<commit>.json.tmp-<uuid>` as a direct sibling)
        observed_during_stream.append(sorted(os.listdir(log_dir)))
        raise RuntimeError("chunk source failed")

    with pytest.raises(RuntimeError, match="chunk source failed"):
        fs.create_atomic_stream(target, bad_chunks())

    assert not os.path.exists(target), "torn commit became visible"
    loose = [
        f
        for f in os.listdir(log_dir)
        if ".tmp-" in f or ".stream-" in f
    ]
    assert not loose, f"orphaned tmp loose in _delta_log: {loose}"
    assert observed_during_stream and not any(
        ".tmp-" in f or ".stream-" in f
        for f in observed_during_stream[0]
    ), "streamed tmp staged as a direct _delta_log sibling, not .tmp/"

    # retry of the same version succeeds (the failed attempt left no
    # O_EXCL landmine), and losing a real race raises FileExistsError
    fs.create_atomic_stream(target, iter([b'{"ok":1}\n']))
    with open(target) as f:
        assert json.load(f) == {"ok": 1}
    with pytest.raises(FileExistsError):
        fs.create_atomic_stream(target, iter([b'{"ok":2}\n']))


def test_streamed_commit_lost_race_at_rename(spark, tmp_path, fs_mode):
    """The destination appearing AFTER the early exists-check (a true
    lost race decided at link/rename time) surfaces as FileExistsError
    on both facades — on HadoopFS this exercises the java-exception-class
    detection (ADVICE r10: free-text matching breaks on wrapping FS
    implementations)."""
    log_dir = str(tmp_path / "t2" / "_delta_log")
    fs = get_fs(log_dir, spark)
    fs.mkdirs(log_dir)
    target = os.path.join(log_dir, f"{3:020d}.json")

    def racing_chunks():
        yield b'{"mine":1}\n'
        # the opponent lands between the exists-check and the rename
        with open(target, "wb") as f:
            f.write(b'{"winner":1}\n')
        yield b'{"mine":2}\n'

    with pytest.raises(FileExistsError):
        fs.create_atomic_stream(target, racing_chunks())
    with open(target) as f:
        assert json.load(f) == {"winner": 1}, "loser clobbered the winner"


def test_light_truncate_replans_once_on_append_race(
    spark, tmp_path, monkeypatch
):
    """One blind append interleaving with a light TRUNCATE: the strict
    watermark loses, the bounded re-plan retries against the fresh
    snapshot, and the truncate lands — removing the racer's file too
    (truncate-after-append is the serialized outcome). Sub-threshold
    behavior (commute-check retry) and light behavior now agree for this
    benign shape (ADVICE r10)."""
    from athena_delta_lake_spark.delta import writer as W

    path = str(tmp_path / "trunc_retry")
    _mk_light(spark, path, monkeypatch)

    real = W.commit_streamed_removes
    raced = []

    def race_once(spark_, table_path, operation, header, light, **kw):
        if not raced:
            raced.append(True)
            write_delta(
                spark.createDataFrame(
                    [(7777, 0, 7.0)], "id long, k long, v double"
                ),
                path,
                mode="append",
            )
        return real(spark_, table_path, operation, header, light, **kw)

    monkeypatch.setattr(W, "commit_streamed_removes", race_once)
    # dml.truncate_table imports from .writer inside the function, so the
    # monkeypatch on the writer module is what it sees
    res = truncate_table(path)
    monkeypatch.setattr(W, "commit_streamed_removes", real)
    assert res["files_removed"] >= 1
    DeltaLog.clear_cache()
    assert DeltaTable(spark, path).to_df().count() == 0
    _assert_log_integrity(path)


def test_light_truncate_gives_up_after_second_race(
    spark, tmp_path, monkeypatch
):
    """Losing the watermark race on BOTH attempts surfaces
    ConcurrentWriteError — the retry is bounded, never a spin."""
    from athena_delta_lake_spark.delta import writer as W

    path = str(tmp_path / "trunc_lose")
    _mk_light(spark, path, monkeypatch)

    real = W.commit_streamed_removes
    n = [0]

    def race_every_time(spark_, table_path, operation, header, light, **kw):
        n[0] += 1
        write_delta(
            spark.createDataFrame(
                [(8000 + n[0], 0, 8.0)], "id long, k long, v double"
            ),
            path,
            mode="append",
        )
        return real(spark_, table_path, operation, header, light, **kw)

    monkeypatch.setattr(W, "commit_streamed_removes", race_every_time)
    with pytest.raises(ConcurrentWriteError):
        truncate_table(path)
    assert n[0] == 2, "retry not bounded to one re-plan"
    monkeypatch.setattr(W, "commit_streamed_removes", real)
    # both racer appends survived; nothing was truncated
    DeltaLog.clear_cache()
    assert DeltaTable(spark, path).to_df().count() == 42
    _assert_log_integrity(path)
