"""Round-8 regression tests for the round-7 VERDICT asks.

Lead item: MERGE touched-file detection used to key live files by
BASENAME (`os.path.basename(f.path)`), which last-wins on collisions.
Self-written tables embed a per-file uuid so they can never collide, but
foreign layouts legitimately can — Spark's dynamic-partition writer
reuses one task's part-file basename across every `k=v` subdirectory
(delta-spark tables routinely look like `year=1/part-00000-x.parquet` +
`year=2/part-00000-x.parquet`). With basename keys, a MERGE matching
rows in the first file resolved the hit to the SECOND: the matched file
was never rewritten and the source rows inserted as "not matched" —
silent duplicate keys. Fixed by keying on the scheme-stripped absolute
path (dml._live_files_by_path), the same normalization the scan applies
to `_metadata.file_path`.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from athena_delta_lake_spark.delta.table import DeltaTable

COLLIDING_BASENAME = "part-00000-abc123.c000.snappy.parquet"

_SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "double", "nullable": True, "metadata": {}},
            {"name": "year", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
)


def _foreign_partitioned_table(tmp_path) -> str:
    """A partitioned Delta table whose two partition directories share ONE
    part-file basename — the delta-spark dynamic-partition shape, which no
    self-written table can produce (writer embeds a per-file uuid)."""
    root = str(tmp_path / "collide")
    for year, ids in ((1, [1, 2]), (2, [3, 4])):
        d = os.path.join(root, f"year={year}")
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "val": pa.array([float(i) * 10 for i in ids], pa.float64()),
                }
            ),
            os.path.join(d, COLLIDING_BASENAME),
        )
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "foreign-layout-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA_STR,
                "partitionColumns": ["year"],
                "configuration": {},
            }
        },
    ] + [
        {
            "add": {
                "path": f"year={year}/{COLLIDING_BASENAME}",
                "partitionValues": {"year": str(year)},
                "size": os.path.getsize(
                    os.path.join(root, f"year={year}", COLLIDING_BASENAME)
                ),
                "modificationTime": 1,
                "dataChange": True,
            }
        }
        for year in (1, 2)
    ]
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return root


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_foreign_layout_colliding_basenames(spark, tmp_path, mode):
    root = _foreign_partitioned_table(tmp_path)
    t = DeltaTable(spark, root)
    src = spark.createDataFrame(
        [Row(id=1, val=999.0, year=1), Row(id=9, val=90.0, year=2)]
    )
    t.merge(src, keys=["id"], mode=mode)

    rows = {r["id"]: r for r in t.to_df().collect()}
    # no silent duplicate: id=1 matched the year=1 file and was UPDATED
    assert len(rows) == 5, sorted(t.to_df().collect(), key=lambda r: r["id"])
    assert rows[1]["val"] == 999.0 and rows[1]["year"] == 1
    # the untouched partition survived verbatim
    assert rows[3]["val"] == 30.0 and rows[4]["val"] == 40.0
    assert rows[9]["val"] == 90.0
    # the CORRECT file was rewritten/DV'd: under cow the year=1 add is
    # gone; under mor it stays but carries a deletion vector
    snap = t.snapshot()
    by_rel = {f.path: f for f in snap.files}
    y1 = [p for p in by_rel if p.startswith("year=1/")]
    if mode == "cow":
        assert f"year=1/{COLLIDING_BASENAME}" not in by_rel
        assert f"year=2/{COLLIDING_BASENAME}" in by_rel
        assert by_rel[f"year=2/{COLLIDING_BASENAME}"].deletion_vector is None
    else:
        assert by_rel[f"year=1/{COLLIDING_BASENAME}"].deletion_vector is not None
        assert by_rel[f"year=2/{COLLIDING_BASENAME}"].deletion_vector is None


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_nondeterministic_source_consistent(spark, tmp_path, mode):
    """MERGE materializes its source once (lazy localCheckpoint): a
    genuinely non-deterministic source — here a nondeterministic pandas
    UDF gating membership — must NOT be re-evaluated per action, or the
    key probe, staged pieces, and metrics see different samples and a row
    can be counted matched but never rewritten (duplicate keys) or
    dropped entirely. delta-spark's materializeSource semantics."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from athena_delta_lake_spark import write_delta

    @pandas_udf("double")
    def jitter(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.random.random(len(v)))

    path = str(tmp_path / "nondet")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "id int, val double"
    ).repartition(8)
    write_delta(df, path)
    t = DeltaTable(spark, path)

    src = (
        spark.range(200)
        .select(F.col("id").cast("int"), F.lit(999.0).alias("val"))
        .withColumn("__r", jitter.asNondeterministic()(F.col("id")))
        .filter("__r < 0.5")
        .drop("__r")
    )
    t.merge(src, keys=["id"], mode=mode)

    rows = t.to_df().collect()
    ids = sorted(r["id"] for r in rows)
    # every source id already exists in the target: a consistent merge
    # can only UPDATE — no duplicates, no inserts, no losses
    assert len(rows) == 200
    assert ids == list(range(200))
    n_updated = sum(1 for r in rows if r["val"] == 999.0)
    assert 0 < n_updated < 200  # the random sample actually merged


def test_merge_matched_delete_foreign_layout(spark, tmp_path):
    """Same layout, WHEN MATCHED DELETE: the matched row must disappear
    from the year=1 file (basename keying deleted nothing and inserted
    nothing — a silent no-op)."""
    root = _foreign_partitioned_table(tmp_path)
    t = DeltaTable(spark, root)
    src = spark.createDataFrame([Row(id=2, val=0.0, year=1)])
    t.merge(src, keys=["id"], when_matched="delete", when_not_matched=None)
    ids = sorted(r["id"] for r in t.to_df().collect())
    assert ids == [1, 3, 4]


_WALK_SCHEMA_STR = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _foreign_add(root, version, rows_by_k, basename):
    """Simulate a FOREIGN writer appending data files: one shared part-file
    basename across every `k=v` directory (Spark's dynamic-partition
    staging shape), committed by hand-written log JSON."""
    actions = []
    for k, ids in rows_by_k.items():
        d = os.path.join(root, f"k={k}")
        os.makedirs(d, exist_ok=True)
        fp = os.path.join(d, basename)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "v": pa.array([float(i) * 1.5 for i in ids], pa.float64()),
                }
            ),
            fp,
        )
        actions.append(
            {
                "add": {
                    "path": f"k={k}/{basename}",
                    "partitionValues": {"k": str(k)},
                    "size": os.path.getsize(fp),
                    "modificationTime": 1,
                    "dataChange": True,
                }
            }
        )
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        if version == 0:
            f.write(
                json.dumps(
                    {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
                )
                + "\n"
            )
            f.write(
                json.dumps(
                    {
                        "metaData": {
                            "id": "foreign-walk-fixture",
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": _WALK_SCHEMA_STR,
                            "partitionColumns": ["k"],
                            "configuration": {},
                        }
                    }
                )
                + "\n"
            )
        for a in actions:
            f.write(json.dumps(a) + "\n")


@pytest.mark.parametrize("seed", [5, 19])
def test_foreign_layout_dml_walk(spark, tmp_path, seed):
    """Mini DML state machine over a table whose partition directories
    SHARE part-file basenames from step 0 (and keep gaining colliding
    files mid-walk via a simulated foreign writer): every merge / delete /
    update, COW and MOR, must keep matching the pandas model — the
    collision-hazard soak the main state machine cannot run (its writer
    uuids make collisions impossible)."""
    import random

    import pandas as pd

    from athena_delta_lake_spark.delta.log import DeltaLog

    rng = random.Random(seed)
    root = str(tmp_path / f"foreign_{seed}")
    next_id = 30
    rows_by_k = {k: [i for i in range(30) if i % 3 == k] for k in range(3)}
    _foreign_add(root, 0, rows_by_k, "part-00000-dup0.c000.snappy.parquet")
    model = pd.DataFrame(
        [(i, i % 3, float(i) * 1.5) for i in range(30)], columns=["id", "k", "v"]
    )

    def state():
        return sorted(
            tuple(r) for r in DeltaTable(spark, root).to_df().collect()
        )

    for step in range(10):
        op = rng.choice(
            ["merge", "delete", "update", "foreign_append", "merge_delete"]
        )
        mode = rng.choice(["cow", "mor"])
        t = DeltaTable(spark, root)
        if op == "foreign_append":
            lo = next_id
            ids = list(range(lo, lo + 9))
            next_id += 9
            by_k = {k: [i for i in ids if i % 3 == k] for k in range(3)}
            _foreign_add(
                root,
                DeltaLog(root).latest_version() + 1,
                by_k,
                f"part-0000{step}-dup.c000.snappy.parquet",
            )
            DeltaLog.clear_cache()
            model = pd.concat(
                [
                    model,
                    pd.DataFrame(
                        [(i, i % 3, float(i) * 1.5) for i in ids],
                        columns=["id", "k", "v"],
                    ),
                ],
                ignore_index=True,
            )
        elif op == "merge":
            lo = rng.randint(0, max(next_id - 8, 1))
            src_rows = [(i, i % 3, -1.0) for i in range(lo, lo + 10)]
            t.merge(
                spark.createDataFrame(src_rows, "id long, k int, v double"),
                keys=["id"],
                mode=mode,
            )
            present = set(model.id)
            for i, k, v in src_rows:
                if i in present:
                    model.loc[model.id == i, ["k", "v"]] = [k, v]
                else:
                    model = pd.concat(
                        [
                            model,
                            pd.DataFrame([(i, k, v)], columns=["id", "k", "v"]),
                        ],
                        ignore_index=True,
                    )
            next_id = max(next_id, lo + 10)
        elif op == "merge_delete":
            lo = rng.randint(0, max(next_id - 6, 1))
            src_rows = [(i, i % 3, 0.0) for i in range(lo, lo + 6)]
            t.merge(
                spark.createDataFrame(src_rows, "id long, k int, v double"),
                keys=["id"],
                when_matched="delete",
                when_not_matched=None,
                mode=mode,
            )
            model = model[~model.id.isin({r[0] for r in src_rows})]
        elif op == "delete":
            kk = rng.randint(0, 2)
            cut = rng.randint(0, next_id)
            t.delete(where=f"k = {kk} AND id < {cut}", mode=mode)
            model = model[~((model.k == kk) & (model.id < cut))]
        elif op == "update":
            kk = rng.randint(0, 2)
            t.update({"v": "v + 100"}, where=f"k = {kk}", mode=mode)
            model = model.copy()
            model.loc[model.k == kk, "v"] += 100
        want = sorted(
            (int(r.id), int(r.k), float(r.v))
            for r in model.itertuples(index=False)
        )
        assert state() == want, (
            f"divergence after step {step} op {op}/{mode} (seed {seed})"
        )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_source_blocks_released(spark, tmp_path, mode):
    """The materialized (localCheckpoint'd) merge source must not leak
    executor storage blocks after the merge returns — a streaming
    foreachBatch issuing one merge per micro-batch would otherwise
    accumulate one dead copy per batch until driver GC."""
    from athena_delta_lake_spark import write_delta

    sc = spark.sparkContext

    def n_blocks():
        return len(sc._jsc.sc().getRDDStorageInfo())

    path = str(tmp_path / f"rel_{mode}")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], "id long, v double"
        ),
        path,
    )
    t = DeltaTable(spark, path)
    before = n_blocks()
    for batch in range(3):
        src = spark.createDataFrame(
            [(i, 100.0 + batch) for i in range(batch * 5, batch * 5 + 10)],
            "id long, v double",
        )
        t.merge(src, keys=["id"], mode=mode)
    assert n_blocks() <= before, (before, n_blocks())
    assert t.to_df().count() == 50


def test_count_partial_parse_falls_back_to_scan(spark, tmp_path):
    """count(where=<string with an unparseable conjunct>) must scan, not
    answer from metadata with only the parsed conjuncts — 'part = 3 AND
    id % 2 = 1' used to return every part=3 row (~2x too high)."""
    from athena_delta_lake_spark import write_delta

    path = str(tmp_path / "cntfix")
    write_delta(
        spark.createDataFrame(
            [(i, i % 4) for i in range(400)], "id long, part int"
        ),
        path,
        partition_by=["part"],
    )
    t = DeltaTable(spark, path)
    # part=3 holds ids ≡ 3 (mod 4); the unparseable conjunct keeps half
    assert t.count(where="part = 3 AND id % 8 = 3") == 50
    assert t.count(where="part = 3") == 100  # metadata path still exact


def test_merge_key_range_pruning(spark, tmp_path):
    """Merge touched-file probing prunes by the SOURCE's key min/max
    (delta-spark's merge pruning): on a key-clustered table a narrow
    source probes only the intersecting files — and results are
    identical to the unpruned semantics."""
    from athena_delta_lake_spark import write_delta
    from athena_delta_lake_spark.delta.dml import _merge_key_range_candidates
    from athena_delta_lake_spark.delta.log import DeltaLog

    path = str(tmp_path / "krp")
    df = spark.range(1000).selectExpr("id", "id * 1.0 AS v").repartitionByRange(
        10, "id"
    )
    write_delta(df, path)
    snap = DeltaLog(path).snapshot()
    assert len(snap.files) == 10
    src = spark.createDataFrame([(5, 99.0), (7, 88.0)], "id long, v double")
    cands = _merge_key_range_candidates(spark, snap, src, ["id"])
    assert 1 <= len(cands) < 10  # pruned to the narrow id range
    # all-NULL key range bails to the full live list (conservative)
    null_src = spark.createDataFrame(
        [(None, 1.0)], "id long, v double"
    )
    assert len(
        _merge_key_range_candidates(spark, snap, null_src, ["id"])
    ) == 10
    # unprunable key type (array) bails too
    asrc = src.selectExpr("array(id) AS id", "v")
    assert len(
        _merge_key_range_candidates(spark, snap, asrc, ["id"])
    ) == 10

    # end-to-end: pruned merge result == expected (update + insert)
    t = DeltaTable(spark, path)
    before = {f.path for f in snap.files}
    t.merge(
        spark.createDataFrame(
            [(5, 99.0), (2000, 1.0)], "id long, v double"
        ),
        keys=["id"],
    )
    rows = {r["id"]: r["v"] for r in t.to_df().collect()}
    assert len(rows) == 1001 and rows[5] == 99.0 and rows[2000] == 1.0
    # only the file containing id=5 was rewritten; the other 9 survive
    after = {f.path for f in t.snapshot().files}
    assert len(before & after) == 9


def test_merge_key_range_pruning_nan_source(spark, tmp_path):
    """A NaN in a float merge key must NOT poison the pruning bounds:
    Spark's max() returns NaN (sorts largest) and IEEE `x <= NaN` is
    FALSE for every file — a naive bound would prune everything and turn
    matched rows into duplicate inserts. Non-finite bounds are dropped
    per bound; the merge stays exact."""
    from athena_delta_lake_spark import write_delta

    path = str(tmp_path / "nan")
    df = spark.range(1000).selectExpr(
        "CAST(id AS DOUBLE) AS id", "id * 1.0 AS v"
    ).repartitionByRange(10, "id")
    write_delta(df, path)
    t = DeltaTable(spark, path)
    src = spark.createDataFrame(
        [(5.0, -1.0), (float("nan"), -2.0)], "id double, v double"
    )
    t.merge(src, keys=["id"])
    rows = t.to_df().collect()
    by_id = {}
    n_nan = 0
    import math

    for r in rows:
        if r["id"] is not None and math.isnan(r["id"]):
            n_nan += 1
        else:
            by_id.setdefault(r["id"], []).append(r["v"])
    # id=5.0 was UPDATED in place (no duplicate), NaN row inserted once
    assert by_id[5.0] == [-1.0]
    assert all(len(v) == 1 for v in by_id.values())
    assert len(by_id) == 1000 and n_nan == 1
