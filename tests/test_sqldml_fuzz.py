"""SQL conformance fuzz: a seeded random walk of INSERT / DELETE /
UPDATE / INSERT OVERWRITE PARTITION / TRUNCATE statements executed
verbatim against BOTH the pond's SQL endpoint and DuckDB, with full
table equality asserted after every statement. Statement-level
end-to-end coverage no hand-written case enumerates: the same SQL text
must mean the same thing in both engines."""

from __future__ import annotations

import random

import duckdb
import pytest

# slow tier (round-12): randomized walks / fuzz soaks — deselected by
# the default fast tier (see pytest.ini); the full tier runs them all
pytestmark = pytest.mark.slow

from athena_delta_lake_spark.catalog import DeltaPond


def _pond_state(pond):
    return sorted(
        (r["id"], r["k"], round(r["v"], 6))
        for r in pond.sql("SELECT id, k, v FROM lake.f").collect()
    )


def _duck_state(con):
    return sorted(
        (int(i), int(k), round(float(v), 6))
        for i, k, v in con.execute("SELECT id, k, v FROM f").fetchall()
    )


@pytest.mark.parametrize("seed", [11, 42, 77, 120, 121])
def test_sql_dml_walk_matches_duckdb(spark, tmp_path, seed, plane):
    """Runs on BOTH planning planes (round-10 verdict #5): with the
    threshold forced, every statement's candidate selection and
    Catalyst-rendered predicate runs against light
    collect_pruned_add_files — the round-9 typeless-predicate /
    decimal-coercion hazard class fuzzed where it actually executes."""
    import os as _os

    rng = random.Random(seed)
    root = str(tmp_path / "pond")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    pond.sql(
        "CREATE TABLE lake.f PARTITIONED BY (k) AS "
        "SELECT id, CAST(id % 4 AS INT) AS k, CAST(id AS DOUBLE) / 2 AS v "
        "FROM range(40)"
    )
    if plane == "light":
        from conftest import force_light_engaged

        force_light_engaged(_os.path.join(root, "lake", "f"))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE f AS SELECT r AS id, CAST(r % 4 AS INT) AS k, "
        "CAST(r AS DOUBLE) / 2 AS v FROM range(40) t(r)"
    )
    next_id = 1000

    for step in range(14):
        op = rng.choice(
            [
                "insert", "delete", "update", "update_multi",
                "overwrite_part", "insert_vals", "merge",
            ]
        )
        if op == "insert":
            lo = next_id
            next_id += 5
            stmt = (
                f"INSERT INTO {{t}} SELECT r + {lo}, CAST(r % 4 AS INT), "
                f"CAST(r AS DOUBLE) FROM range(5) t(r)"
            )
            # Spark's range() has no table alias args; use its own form
            pond.sql(
                f"INSERT INTO lake.f SELECT id + {lo}, CAST(id % 4 AS INT), "
                f"CAST(id AS DOUBLE) FROM range(5)"
            )
            con.execute(stmt.format(t="f"))
        elif op == "insert_vals":
            i = next_id
            next_id += 1
            stmt = f"INSERT INTO {{t}} VALUES ({i}, 1, -3.5), ({i}, 2, 0.25)"
            pond.sql(stmt.format(t="lake.f"))
            con.execute(stmt.format(t="f"))
        elif op == "delete":
            kk = rng.randint(0, 3)
            cut = rng.randint(0, next_id)
            stmt = f"DELETE FROM {{t}} WHERE k = {kk} AND id < {cut}"
            pond.sql(stmt.format(t="lake.f"))
            con.execute(stmt.format(t="f"))
        elif op == "update":
            kk = rng.randint(0, 3)
            stmt = f"UPDATE {{t}} SET v = v + 10.5 WHERE k = {kk} AND v < 100"
            pond.sql(stmt.format(t="lake.f"))
            con.execute(stmt.format(t="f"))
        elif op == "update_multi":
            # cross-referencing multi-column SET: SQL evaluates every SET
            # expression and the WHERE against the ORIGINAL row (the
            # round-5 simultaneous-evaluation fix) — and one SET falsifies
            # the predicate, which must not stop the other column
            kk = rng.randint(0, 3)
            stmt = (
                f"UPDATE {{t}} SET k = CAST((k + 1) % 4 AS INT), "
                f"v = v + k WHERE k = {kk}"
            )
            pond.sql(stmt.format(t="lake.f"))
            con.execute(stmt.format(t="f"))
        elif op == "overwrite_part":
            kk = rng.randint(0, 3)
            lo = next_id
            next_id += 3
            pond.sql(
                f"INSERT OVERWRITE lake.f PARTITION (k={kk}) "
                f"SELECT id + {lo}, 7.0 FROM range(3)"
            )
            con.execute(f"DELETE FROM f WHERE k = {kk}")
            con.execute(
                f"INSERT INTO f SELECT r + {lo}, {kk}, 7.0 FROM range(3) t(r)"
            )
        if op == "merge":
            # key-unique source; DuckDB (no MERGE) mirrors the upsert as
            # the equivalent DELETE-matched + INSERT-all
            lo = rng.randint(0, 50)
            src = [(lo + 3 * j, (lo + 3 * j) % 4, -1.5) for j in range(4)]
            vals = ", ".join(f"({i}, {k}, {v})" for i, k, v in src)
            spark.sql(
                f"SELECT * FROM (VALUES {vals}) AS t(id, k, v)"
            ).createOrReplaceTempView("fuzz_src")
            pond.sql(
                "MERGE INTO lake.f AS t USING fuzz_src AS s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            con.execute(
                f"DELETE FROM f WHERE id IN (SELECT id FROM (VALUES {vals}) t(id, k, v))"
            )
            con.execute(f"INSERT INTO f SELECT * FROM (VALUES {vals}) t(id, k, v)")
        got, want = _pond_state(pond), _duck_state(con)
        assert got == want, f"divergence after step {step} op {op} (seed {seed})"

    # closing statements: truncate behaves like DELETE-all
    pond.sql("TRUNCATE TABLE lake.f")
    con.execute("DELETE FROM f")
    assert _pond_state(pond) == _duck_state(con) == []
