"""Distributed (Spark-evaluated) file pruning must give EXACTLY the same
answers as the driver-side Python loop (delta/stats.py prune_files vs
prune_files_distributed) — the metadata-plane scale valve for
million-file tables (round-6 ask #1; the reference's one known
scalability bug was metadata-plane, DeltaMetadataHandler.scala:159-182).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from athena_delta_lake_spark import write_delta
from athena_delta_lake_spark.delta.log import DeltaLog
from athena_delta_lake_spark.delta.reader import read_snapshot
from athena_delta_lake_spark.delta.stats import (
    UnsupportedDistributedPrune,
    prune_files,
    prune_files_auto,
    prune_files_distributed,
)


@pytest.fixture(scope="module")
def snap(spark, tmp_path_factory):
    """Partitioned table with a NULL partition, per-file stats, dates."""
    path = str(tmp_path_factory.mktemp("dp") / "t")
    df = spark.range(1000).selectExpr(
        "id",
        "CASE WHEN id % 10 = 9 THEN NULL ELSE CAST(id % 7 AS INT) END AS k",
        "cast(id as double) / 3 AS v",
        "date_add(date'2024-01-01', cast(id % 50 as int)) AS d",
        "concat('s', lpad(cast(id % 40 as string), 3, '0')) AS s",
        "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,cast(id % 72 as int),0,0) AS ts",
    )
    write_delta(df.repartitionByRange(12, "id"), path, partition_by=["k"])
    return DeltaLog(path).snapshot()


PREDS = [
    [("k", "=", 3)],
    [("k", "=", None)],  # IS NULL partition
    [("k", "!=", 2)],
    [("k", "<", 3)],
    [("k", ">=", 5)],
    [("k", "in", [1, 4, 6])],
    [("k", "in", [])],
    [("id", "<", 100)],
    [("id", ">=", 900)],
    [("id", "=", 500)],
    [("v", "<=", 50.0)],
    [("v", ">", 300.0)],
    [("d", "=", "2024-01-20")],
    [("d", "<", datetime.date(2024, 1, 10))],
    [("s", ">=", "s030")],
    [("ts", "<", "2024-03-02 00:00:00")],
    [("ts", ">=", datetime.datetime(2024, 3, 3, 12, 0, 0))],
    [("ts", "=", "2024-03-01 05:00:00")],
    [("s", "in", ["s001", "s039"])],
    [("k", "=", 3), ("id", ">", 400)],
    [("k", "in", [0, 5]), ("d", ">=", "2024-02-01"), ("v", "<", 200.0)],
    [("id", "!=", 3)],  # != unprovable from stats: keeps everything
    [("nosuch", "=", 1)],  # unknown column: ignored by both paths
]


@pytest.mark.parametrize("preds", PREDS, ids=[str(p) for p in PREDS])
def test_distributed_matches_python(spark, snap, preds):
    py = [f.path for f in prune_files(snap, preds)]
    dist = [f.path for f in prune_files_distributed(spark, snap, preds)]
    assert dist == py


def test_auto_switches_past_threshold(spark, snap, monkeypatch):
    """prune_files_auto routes through the Spark path when the file count
    crosses the env threshold, and the scan result is unchanged."""
    monkeypatch.setenv("ADLS_DISTRIBUTED_PRUNE_FILES", "1")
    calls = {}
    import athena_delta_lake_spark.delta.stats as stats_mod

    orig = stats_mod.prune_files_distributed

    def spy(sp, sn, preds):
        calls["hit"] = True
        return orig(sp, sn, preds)

    monkeypatch.setattr(stats_mod, "prune_files_distributed", spy)
    preds = [("k", "=", 3), ("id", ">", 100)]
    files = prune_files_auto(spark, snap, preds)
    assert calls.get("hit")
    assert [f.path for f in files] == [f.path for f in prune_files(snap, preds)]
    got = (
        read_snapshot(spark, snap, predicates=preds)
        .filter("k = 3 AND id > 100")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
        .first()
    )
    expect_ids = [i for i in range(1000) if i % 10 != 9 and i % 7 == 3 and i > 100]
    assert (got["n"], got["s"]) == (len(expect_ids), sum(expect_ids))


def test_unsupported_shape_falls_back(spark, tmp_path, monkeypatch):
    """Predicates on non-identifier column names (legal in Delta) raise
    inside the distributed path (get_json_object cannot address them
    safely) and prune_files_auto silently falls back to the Python
    loop with identical answers."""
    path = str(tmp_path / "weird")
    write_delta(
        spark.range(100).selectExpr("id", "id * 2 AS `weird col`"), path
    )
    snap2 = DeltaLog(path).snapshot()
    with pytest.raises(UnsupportedDistributedPrune):
        prune_files_distributed(spark, snap2, [("weird col", "<", 50)])
    monkeypatch.setenv("ADLS_DISTRIBUTED_PRUNE_FILES", "1")
    out = prune_files_auto(spark, snap2, [("weird col", "<", 50)])
    assert [f.path for f in out] == [
        f.path for f in prune_files(snap2, [("weird col", "<", 50)])
    ]


def test_dml_uses_auto_path(spark, tmp_path, monkeypatch):
    """DML candidate selection goes through prune_files_auto: a DELETE at
    a forced threshold of 1 still deletes exactly the right rows."""
    from athena_delta_lake_spark.delta.dml import delete

    monkeypatch.setenv("ADLS_DISTRIBUTED_PRUNE_FILES", "1")
    path = str(tmp_path / "t")
    write_delta(
        spark.range(200).selectExpr("id", "cast(id % 4 as int) as p"),
        path,
        partition_by=["p"],
    )
    delete(spark, path, where="p = 2")
    left = read_snapshot(spark, DeltaLog(path).snapshot())
    assert left.count() == 150
    assert left.filter("p = 2").count() == 0


def test_prune_equality_under_divergent_session_tz(spark, snap):
    """Round-9 regression: with spark.sql.session.timeZone forced away
    from the host OS zone, naive/string timestamp predicates must still
    give IDENTICAL answers from both evaluators, interpreted in the
    SESSION zone. The old paths disagreed: python raised TypeError
    (aware stats vs naive value -> kept everything) while the distributed
    evaluator compared F.lit(naive) through the driver OS zone."""
    ts_preds = [
        [("ts", "<", "2024-03-02 00:00:00")],
        [("ts", ">=", datetime.datetime(2024, 3, 3, 12, 0, 0))],
        [("ts", "=", "2024-03-01 05:00:00")],
        [
            (
                "ts",
                "in",
                [
                    datetime.datetime(2024, 3, 1, 5, 0, 0),
                    "2024-03-02 07:00:00",
                ],
            )
        ],
        # aware value: an absolute instant, zone-independent by definition
        [
            (
                "ts",
                ">",
                datetime.datetime(
                    2024, 3, 2, 12, 0, 0, tzinfo=datetime.timezone.utc
                ),
            )
        ],
    ]
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    baselines = []
    for preds in ts_preds:
        py = [f.path for f in prune_files(snap, preds)]
        dist = [f.path for f in prune_files_distributed(spark, snap, preds)]
        assert dist == py, preds
        baselines.append(py)
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        for preds, base in zip(ts_preds, baselines):
            py = [f.path for f in prune_files(snap, preds)]
            dist = [
                f.path for f in prune_files_distributed(spark, snap, preds)
            ]
            assert dist == py, preds
            # naive bounds now mean LA wall clock: the answer may legally
            # differ from the UTC-session baseline, but the AWARE predicate
            # is an absolute instant and must not move at all
            if preds[0][2].__class__ is datetime.datetime and preds[0][
                2
            ].tzinfo is not None:
                assert py == base, preds
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
