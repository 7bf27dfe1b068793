"""SELECT-surface conformance fuzz (round-4): seeded random relational
plans — join chains, filters, grouped aggregates + HAVING, window
functions, set operations, IN/NOT IN subqueries — rendered as
engine-portable ANSI SQL and executed verbatim on BOTH Spark and DuckDB
over the same parquet fixtures, multiset/ordered equality per statement.
Complements tests/test_sqldml_fuzz.py (the DML walk) on the read side.
"""

from __future__ import annotations

import pytest

# slow tier (round-12): randomized walks / fuzz soaks — deselected by
# the default fast tier (see pytest.ini); the full tier runs them all
pytestmark = pytest.mark.slow

from tools.fuzz_select import TABLES, run_seed


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    import duckdb

    from athena_delta_lake_spark.queries.base import load

    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield spark, con
    con.close()


@pytest.mark.parametrize("seed", [11, 42, 77])
def test_select_fuzz_matches_duckdb(engines, seed):
    spark, con = engines
    failures = run_seed(spark, con, seed, n_queries=30)
    assert not failures, failures[:3]


def test_select_fuzz_over_native_delta(engines, sf_dir):
    """Same generated plans, but Spark reads NATIVE Delta tables (log
    replay + snapshot scan) while DuckDB reads the raw parquet — the
    whole engine core sits inside the conformance net."""
    from tools.fuzz_select import bind_spark_tables

    spark, con = engines
    try:
        bind_spark_tables(spark, sf_dir, delta=True)
        failures = run_seed(spark, con, 123, n_queries=20)
        assert not failures, failures[:3]
    finally:
        bind_spark_tables(spark, sf_dir, delta=False)  # restore for peers


def test_select_fuzz_through_pond_sql(engines, sf_dir):
    """Same generated plans routed through pond.sql: every bare relation
    resolves lazily from the storage layout (Delta log replay) and is
    spliced at its parse origin — windows, WINDOW clauses, set ops and
    subqueries all exercise the relation walker."""
    from tools.fuzz_select import bind_spark_tables, make_pond

    spark, con = engines
    pond = make_pond(spark, sf_dir)
    try:
        failures = run_seed(spark, con, 321, n_queries=20, run_sql=pond.sql)
        assert not failures, failures[:3]
    finally:
        bind_spark_tables(spark, sf_dir, delta=False)  # restore for peers


def _force_light(spark, paths, monkeypatch):
    """Checkpoint every fuzz Delta table and force the light threshold,
    asserting engagement — so the generated plans' predicate rendering
    and scan planning run through collect_pruned_add_files /
    LightSnapshot instead of the classic replay (round-10 verdict #5:
    the fuzzers had only ever seen the classic plane; the round-9
    typeless-predicate hazard class lives exactly in this rendering)."""
    from conftest import force_light_engaged

    monkeypatch.setenv("ADLS_LIGHT_PLANNING_FILES", "1")
    for p in paths:
        force_light_engaged(p)


def test_select_fuzz_over_native_delta_forced_light(
    engines, sf_dir, monkeypatch
):
    """Same generated read plans as test_select_fuzz_over_native_delta,
    but every Delta scan resolves through the LIGHT plane."""
    import os

    from tools.fuzz_select import bind_spark_tables

    spark, con = engines
    try:
        bind_spark_tables(spark, sf_dir, delta=True)  # materialize tables
        root = os.path.join(
            "/tmp/adls_fuzz_delta", os.path.basename(sf_dir.rstrip("/"))
        )
        _force_light(
            spark, [os.path.join(root, t) for t in TABLES], monkeypatch
        )
        bind_spark_tables(spark, sf_dir, delta=True)  # re-resolve light
        failures = run_seed(spark, con, 207, n_queries=20)
        assert not failures, failures[:3]
    finally:
        monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES", raising=False)
        from athena_delta_lake_spark.delta.log import DeltaLog

        DeltaLog.clear_cache()
        bind_spark_tables(spark, sf_dir, delta=False)  # restore for peers


def test_select_fuzz_through_pond_sql_forced_light(
    engines, sf_dir, monkeypatch
):
    """pond.sql resolves every bare relation lazily PER QUERY, so with
    the threshold forced each generated statement plans light at
    resolution time — windows, set ops and subqueries included."""
    import os

    from tools.fuzz_select import bind_spark_tables, make_pond

    spark, con = engines
    pond = make_pond(spark, sf_dir)
    root = os.path.join(
        "/tmp/adls_fuzz_pond", os.path.basename(sf_dir.rstrip("/"))
    )
    try:
        _force_light(
            spark,
            [os.path.join(root, "lake", t) for t in TABLES],
            monkeypatch,
        )
        failures = run_seed(spark, con, 489, n_queries=20, run_sql=pond.sql)
        assert not failures, failures[:3]
    finally:
        monkeypatch.delenv("ADLS_LIGHT_PLANNING_FILES", raising=False)
        from athena_delta_lake_spark.delta.log import DeltaLog

        DeltaLog.clear_cache()
        bind_spark_tables(spark, sf_dir, delta=False)  # restore for peers
