"""Metadata-plane regressions at (scaled-down) file-count scale: the
synthetic-log replay + checkpoint round-trip + prune-equality invariants
that tools/meta_scale.py measures at 10^5–10^6 adds (PERF_TRIAGE_r6.md
records the big-number runs; this keeps the machinery correct in CI)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from meta_scale import build_log  # noqa: E402

from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.stats import (
    prune_files,
    prune_files_distributed,
)
from athena_delta_lake_spark.delta.writer import write_checkpoint

PREDS = [
    ("day", ">=", "2024-01-20"),
    ("day", "<", "2024-02-10"),
    ("id", ">=", 100_000_000),
]


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("meta"))
    path = build_log(root, 5_000, 500)
    return path


def test_synthetic_replay_counts(synth):
    snap = DeltaLog(synth).snapshot()
    assert snap.num_files == 5_000
    assert snap.partition_columns == ["day"]
    # stats parse lazily: raw strings survive replay untouched
    f = snap.files[0]
    assert isinstance(f.stats_raw, str)
    assert f.stats["numRecords"] == 100_000
    assert f.stats_json() == f.stats_raw


def test_checkpoint_roundtrip_multipart(synth):
    write_checkpoint(synth, parts=3)
    DeltaLog.clear_cache()
    snap = DeltaLog(synth).snapshot()
    assert snap.num_files == 5_000
    # columnar fold preserved stats text + partition values
    f = next(x for x in snap.files if x.path.endswith("part-0000042.parquet"))
    assert f.partition_values == {"day": "2024-02-12"}
    assert f.stats["minValues"]["id"] == 42 * 100_000


def test_prune_equality_python_vs_distributed(spark, synth):
    snap = DeltaLog(synth).snapshot()
    py = prune_files(snap, PREDS)
    dist = prune_files_distributed(spark, snap, PREDS)
    assert [f.path for f in dist] == [f.path for f in py]
    assert 0 < len(py) < snap.num_files


def test_checkpointed_prune_equality(spark, synth):
    """Same predicates, snapshot replayed THROUGH the checkpoint (raw
    stats strings from parquet instead of commit JSON)."""
    DeltaLog.clear_cache()
    snap = DeltaLog(synth).snapshot()
    py = prune_files(snap, PREDS)
    dist = prune_files_distributed(spark, snap, PREDS)
    assert [f.path for f in dist] == [f.path for f in py]


def test_light_snapshot_equality_on_synthetic_log(spark, synth):
    """snapshot_light == classic snapshot on the synthetic checkpointed
    log (round-7 ask #6) — file set, header, and prune answers."""
    # reuse the checkpoint test_checkpoint_roundtrip_multipart wrote (a
    # second part-set at the same version would collide); write one only
    # when this test runs in isolation
    import os as _os

    if not any(
        ".checkpoint." in n
        for n in _os.listdir(_os.path.join(synth, "_delta_log"))
    ):
        write_checkpoint(synth, parts=2)
    DeltaLog.clear_cache()
    log = DeltaLog(synth)
    snap = log.snapshot()
    light = log.snapshot_light()
    assert light.version == snap.version
    assert light.metadata == snap.metadata
    assert len(light.overlay_adds) == 0  # checkpoint covers everything
    assert light.files_df(spark).count() == snap.num_files
    want = sorted(f.path for f in prune_files(snap, PREDS))
    got = sorted(r["path"] for r in light.prune_df(spark, PREDS).collect())
    assert got == want
