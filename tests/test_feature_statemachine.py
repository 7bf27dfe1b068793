"""Seeded feature-lifecycle state machine: random walks of feature
enablement (CDF, row tracking, column mapping, constraints), DML that
creates traces (MOR deletes -> deletion vectors), trace removal (REORG,
DROP CONSTRAINT) and ALTER TABLE ... DROP FEATURE attempts — asserting
after EVERY step that (a) table content matches a python model exactly,
(b) a drop either succeeds (feature gone from the protocol) or refuses
with a reason consistent with the observable state (live traces /
retained history), and (c) the table stays read/writable across
protocol downgrades, including TRUNCATE HISTORY ones."""

from __future__ import annotations

import random

import pytest

# slow tier (round-12): randomized walks / fuzz soaks — deselected by
# the default fast tier (see pytest.ini); the full tier runs them all
pytestmark = pytest.mark.slow

from athena_delta_lake_spark import DeltaTable, write_delta
from athena_delta_lake_spark.catalog import DeltaPond
from athena_delta_lake_spark.delta import DeltaLog, drop_feature
from athena_delta_lake_spark.delta.dml import delete_mor
from athena_delta_lake_spark.delta.features import _explicit_feature_sets
from athena_delta_lake_spark.delta.writer import (
    add_check_constraint,
    drop_check_constraint,
    enable_column_mapping,
    enable_row_tracking,
    rename_column,
    write_checkpoint,
)


def _content(spark, path, kcol="k"):
    return sorted(
        (r["id"], r[kcol])
        for r in DeltaTable(spark, path).to_df().select("id", kcol).collect()
    )


def _feats(path):
    r, w = _explicit_feature_sets(DeltaLog(path).snapshot().protocol)
    return r | w


@pytest.mark.parametrize("seed", [7, 23, 61, 5, 42, 99])
def test_feature_lifecycle_walk(spark, tmp_path, seed, plane):
    rng = random.Random(seed)
    root = str(tmp_path / f"pond_{seed}")
    path = f"{root}/lake/t"
    cdf_at_create = seed % 2 == 0
    write_delta(
        spark.range(40).selectExpr("id", "CAST(id % 4 AS INT) AS k"),
        path,
        configuration=(
            {"delta.enableChangeDataFeed": "true"} if cdf_at_create else None
        ),
    )
    pond = DeltaPond(spark, root)
    if plane == "light":
        from conftest import force_light_engaged

        force_light_engaged(path)
    model = {i: i % 4 for i in range(40)}
    next_id = 1000
    constraint_live = False
    kcol = "k"  # live logical name of the second column (physical: "k")
    ever_dv = False

    for step in range(22):
        op = rng.choice(
            [
                "append", "delete_mor", "reorg", "checkpoint",
                "enable_cdf", "enable_row_tracking", "enable_mapping",
                "add_constraint", "drop_constraint", "rename_col",
                "drop_cdf", "drop_row_tracking", "drop_constraints_feat",
                "drop_dv", "drop_mapping",
            ]
        )
        feats = _feats(path)
        if op == "append":
            lo = next_id
            next_id += 6
            write_delta(
                spark.range(lo, lo + 6).selectExpr(
                    "id", f"CAST(id % 4 AS INT) AS {kcol}"
                ),
                path,
                mode="append",
            )
            model.update({i: i % 4 for i in range(lo, lo + 6)})
        elif op == "delete_mor" and model:
            m, r0 = rng.choice([(3, 0), (5, 1), (7, 2)])
            delete_mor(spark, path, f"id % {m} = {r0}")
            model = {i: k for i, k in model.items() if i % m != r0}
            ever_dv = True
        elif op == "reorg":
            pond.sql("REORG TABLE lake.t APPLY (PURGE)")
            assert not any(
                f.deletion_vector for f in DeltaLog(path).snapshot().files
            )
        elif op == "checkpoint":
            write_checkpoint(path)
        elif op == "enable_cdf":
            pond.sql(
                "ALTER TABLE lake.t SET TBLPROPERTIES "
                "('delta.enableChangeDataFeed' = 'true')"
            )
        elif op == "enable_row_tracking":
            enable_row_tracking(path)
        elif op == "enable_mapping":
            enable_column_mapping(path)
        elif op == "add_constraint" and not constraint_live:
            add_check_constraint(spark, path, "nonneg", "id >= 0")
            constraint_live = True
        elif op == "drop_constraint" and constraint_live:
            drop_check_constraint(path, "nonneg")
            constraint_live = False
        elif op == "rename_col" and "columnMapping" in feats:
            # flip the logical name; the physicalName stays "k", so while
            # kcol != "k" the mapping layout has diverged and the feature
            # must refuse to drop — renaming BACK restores physical ==
            # logical and the drop becomes legal again
            new = "k2" if kcol == "k" else "k"
            rename_column(path, kcol, new)
            kcol = new
        elif op == "drop_cdf" and "changeDataFeed" in feats:
            drop_feature(path, "changeDataFeed")
            assert "changeDataFeed" not in _feats(path)
        elif op == "drop_row_tracking" and "rowTracking" in feats:
            drop_feature(path, "rowTracking")
            assert "rowTracking" not in _feats(path)
        elif op == "drop_constraints_feat" and "checkConstraints" in feats:
            if constraint_live:
                with pytest.raises(ValueError, match="DROP CONSTRAINT"):
                    drop_feature(path, "checkConstraints")
            else:
                drop_feature(path, "checkConstraints")
                assert "checkConstraints" not in _feats(path)
        elif op == "drop_dv" and "deletionVectors" in feats:
            truncate = rng.random() < 0.7
            snap = DeltaLog(path).snapshot()
            live_dv = any(f.deletion_vector for f in snap.files)
            try:
                res = drop_feature(
                    path, "deletionVectors", truncate_history=truncate
                )
                assert not live_dv, "drop succeeded over live DVs"
                assert "deletionVectors" not in _feats(path)
                if res["checkpoint_protection"] is not None:
                    # round-7: a traced drop without truncation takes the
                    # Delta 4.0 checkpointProtection path — history
                    # survives and the protection is declared
                    assert not truncate and ever_dv
                    assert res["truncated"] == []
                    assert "checkpointProtection" in _feats(path)
                    cfg = DeltaLog(path).snapshot().metadata.get(
                        "configuration"
                    ) or {}
                    assert cfg.get(
                        "delta.requireCheckpointProtectionBeforeVersion"
                    ) == str(res["version"])
            except ValueError as e:
                # only remaining refusal: live DVs in the snapshot
                assert live_dv and "REORG" in str(e)
        elif op == "drop_mapping" and "columnMapping" in feats:
            try:
                drop_feature(path, "columnMapping", truncate_history=True)
                assert kcol == "k", "drop succeeded over a diverged layout"
                assert "columnMapping" not in _feats(path)
            except ValueError as e:
                assert kcol != "k"
                assert "physical names diverge" in str(e)

        # ---- invariants after EVERY step ----
        assert _content(spark, path, kcol) == sorted(model.items()), (
            f"content diverged after step {step} op {op} (seed {seed})"
        )
        # the protocol never lists a feature with zero implementation
        # support, and the snapshot replays cleanly post-truncation
        snap = DeltaLog(path).snapshot()
        assert snap.version >= 0
        # SQL surface stays alive across downgrades
        n = pond.sql("SELECT count(*) AS n FROM lake.t").first()["n"]
        assert n == len(model)

    # end state: whatever remains on the protocol, the table is writable
    write_delta(
        spark.range(9000, 9006).selectExpr(
            "id", f"CAST(id % 4 AS INT) AS {kcol}"
        ),
        path,
        mode="append",
    )
    model.update({i: i % 4 for i in range(9000, 9006)})
    assert _content(spark, path, kcol) == sorted(model.items())
