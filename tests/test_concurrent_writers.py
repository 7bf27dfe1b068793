"""Randomized concurrent-writer fuzz: N threads race seeded append /
delete(cow|mor) / optimize / constraint-DDL transactions against ONE table
through the real OCC commit path (_atomic_commit's O_EXCL create is the arbiter, exactly as
in production — threads race at the filesystem, not around it).

Invariants asserted after every run:
- the log is gap-free (exactly one commit JSON per version 0..latest):
  atomic version allocation never double-commits or skips;
- no lost updates: every successfully-appended row is present unless a
  successful delete's predicate covered it; rows from failed transactions
  never appear;
- disjoint per-thread id spaces make the final state exactly computable;
  a shared contested range must be empty iff any racer's delete succeeded;
- the only surfaced failure mode is ConcurrentWriteError (never corruption,
  never a partial commit);
- no clobbered metaData: every ADD CONSTRAINT that REPORTED success is in
  the final configuration (a racer losing the O_EXCL create must never
  re-commit its stale metaData over the winner's);
- replay at several historical versions still parses (snapshot integrity).

This is the two-writer race harness the OCC retry logic (writer.py) was
previously tested for only via monkeypatched single-race simulations.
"""

import random
import threading

import pytest

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.writer import ConcurrentWriteError


@pytest.mark.parametrize("seed", [5, 19])
def test_concurrent_writer_races(spark, tmp_path, seed):
    path = str(tmp_path / f"race_{seed}")
    n_threads, ops_per_thread = 4, 5
    shared_lo, shared_hi = 10_000_000, 10_000_050

    base = [(i, i % 4) for i in range(shared_lo, shared_hi)]
    write_delta(
        spark.createDataFrame(base, "id long, k long"), path, partition_by=[]
    )

    results = [
        {"appended": set(), "deleted": set(), "shared_delete": False, "errors": []}
        for _ in range(n_threads)
    ]
    barrier = threading.Barrier(n_threads)

    def worker(tid: int):
        rng = random.Random(seed * 100 + tid)
        t = DeltaTable(spark, path)
        my_base = (tid + 1) * 1_000_000
        seq = 0
        barrier.wait()
        for _ in range(ops_per_thread):
            op = rng.choice(
                [
                    "append", "append", "delete_own", "delete_shared",
                    "optimize", "add_constraint", "delete_serial",
                ]
            )
            try:
                if op == "append":
                    n = rng.randint(3, 10)
                    rows = [(my_base + seq + j, j % 4) for j in range(n)]
                    seq += n
                    write_delta(
                        spark.createDataFrame(rows, "id long, k long"),
                        path,
                        mode="append",
                    )
                    results[tid]["appended"].update(r[0] for r in rows)
                elif op == "delete_own":
                    if not results[tid]["appended"]:
                        continue
                    victims = set(
                        rng.sample(
                            sorted(results[tid]["appended"]),
                            min(5, len(results[tid]["appended"])),
                        )
                    )
                    mode = rng.choice(["cow", "mor"])
                    t.delete(
                        where=f"id in ({','.join(map(str, victims))})", mode=mode
                    )
                    results[tid]["deleted"].update(victims)
                elif op == "delete_serial":
                    # serializable isolation under real contention: a
                    # concurrent append matching the predicate forces a
                    # clean ConcurrentWriteError, never a wrong answer
                    if not results[tid]["appended"]:
                        continue
                    victims = set(
                        rng.sample(
                            sorted(results[tid]["appended"]),
                            min(4, len(results[tid]["appended"])),
                        )
                    )
                    from athena_delta_lake_spark.delta.dml import (
                        delete as _ser_delete,
                    )

                    _ser_delete(
                        spark,
                        path,
                        f"id in ({','.join(map(str, victims))})",
                        isolation="serializable",
                    )
                    results[tid]["deleted"].update(victims)
                elif op == "delete_shared":
                    t.delete(
                        where=f"id >= {shared_lo} and id < {shared_hi}",
                        mode=rng.choice(["cow", "mor"]),
                    )
                    results[tid]["shared_delete"] = True
                elif op == "optimize":
                    t.compact(target_file_size=1 << 30)
                elif op == "add_constraint":
                    from athena_delta_lake_spark.delta.writer import (
                        add_check_constraint,
                    )

                    cname = f"c_{tid}_{seq}"
                    seq += 1
                    add_check_constraint(spark, path, cname, "id >= 0")
                    results[tid].setdefault("constraints", set()).add(cname)
            except ConcurrentWriteError as e:
                results[tid]["errors"].append((op, str(e)[:80]))
            # any other exception propagates and fails the test

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
        assert not th.is_alive(), "worker deadlocked"

    # 1. gap-free log: one commit JSON per version
    import os

    log_dir = os.path.join(path, "_delta_log")
    versions = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f[0].isdigit()
    )
    assert versions == list(range(len(versions))), "log has gaps or duplicates"
    DeltaLog.clear_cache()
    assert DeltaLog(path).latest_version() == versions[-1]

    # 2. exact final state from the per-thread models
    expect = set()
    for r in results:
        expect |= r["appended"] - r["deleted"]
    if not any(r["shared_delete"] for r in results):
        expect |= {i for i, _ in base}
    got = {
        r["id"] for r in DeltaTable(spark, path).to_df().select("id").collect()
    }
    assert got == expect, (
        f"lost updates or resurrections: missing={sorted(expect - got)[:5]} "
        f"extra={sorted(got - expect)[:5]}"
    )

    # 2b. no clobbered metaData: every constraint whose commit reported
    # success is present in the final configuration
    want_constraints = set()
    for r in results:
        want_constraints |= r.get("constraints", set())
    final_config = DeltaLog(path).snapshot().metadata.get("configuration") or {}
    have = {
        k.split(".")[-1] for k in final_config if k.startswith("delta.constraints.")
    }
    assert want_constraints <= have, (
        f"constraints clobbered by a racing metaData commit: "
        f"{sorted(want_constraints - have)}"
    )

    # 3. historical replay still parses at a few versions
    for v in {0, versions[-1] // 2, versions[-1]}:
        DeltaTable(spark, path).to_df(version=v).count()

    # 4. contention actually happened in at least one run shape: either some
    # thread hit a ConcurrentWriteError or every op serialized cleanly —
    # both are legal; what's illegal is any OTHER failure (propagated above)


def test_stale_plan_first_attempt_conflict_detected(spark, tmp_path, monkeypatch):
    """TOCTOU regression (found by this fuzz): a rewrite PLANNED against a
    stale snapshot whose _next_version already reflects the winner commits
    on its FIRST attempt — no FileExistsError ever fires, so the old code
    skipped conflict validation entirely and silently resurrected rows a
    faster writer had just deleted. base_version-driven validation must
    raise instead."""
    import athena_delta_lake_spark.delta.dml as D
    from athena_delta_lake_spark.delta.dml import delete_mor

    path = str(tmp_path / "toctou")
    write_delta(
        spark.createDataFrame([(i, i % 4) for i in range(100)], "id long, k long"),
        path,
    )
    t = DeltaTable(spark, path)

    real_stage = D.stage_data_files
    raced = {"done": False}

    def racing_stage(*a, **k):
        if not raced["done"]:
            raced["done"] = True
            # winner lands while the loser is still staging its rewrite —
            # BEFORE the loser allocates its commit version
            delete_mor(spark, path, "id = 77")
        return real_stage(*a, **k)

    monkeypatch.setattr(D, "stage_data_files", racing_stage)
    with pytest.raises(ConcurrentWriteError, match="same files"):
        t.delete(where="id >= 50")  # cow rewrite planned pre-winner
    monkeypatch.undo()

    # the winner's deletion survives; the loser changed nothing
    ids = {r["id"] for r in t.to_df().select("id").collect()}
    assert 77 not in ids
    assert ids == set(range(100)) - {77}
