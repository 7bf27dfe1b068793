"""Randomized DDL/view state machine (round 5): a seeded walk of
CREATE / CREATE OR REPLACE / ALTER ... AS / RENAME / DROP VIEW,
ALTER TABLE RENAME TO, COMMENT ON TABLE and base-table DML, against a
python model — after every step each live view must re-resolve against
the CURRENT base table state, SHOW VIEWS/TABLES must match the model,
and collisions must refuse. The round-4 view catalog was example-tested
only; this is its interaction net."""

from __future__ import annotations

import random

import pytest

# slow tier (round-12): randomized walks / fuzz soaks — deselected by
# the default fast tier (see pytest.ini); the full tier runs them all
pytestmark = pytest.mark.slow

from athena_delta_lake_spark.catalog import DeltaPond


def _base_rows(pond, table):
    return sorted(
        (r["id"], r["k"], r["v"])
        for r in pond.sql(f"SELECT id, k, v FROM lake.{table}").collect()
    )


def _expected(view_def, rows):
    kind, arg = view_def
    if kind == "filter":
        return sorted((i, k, v) for i, k, v in rows if k == arg)
    if kind == "cap":
        return sorted((i, k, v) for i, k, v in rows if i < arg)
    # agg: per-k count
    from collections import Counter

    return sorted(Counter(k for _i, k, _v in rows).items())


def _read_view(pond, name, view_def):
    kind, _arg = view_def
    if kind in ("filter", "cap"):
        return sorted(
            (r["id"], r["k"], r["v"])
            for r in pond.sql(f"SELECT id, k, v FROM {name}").collect()
        )
    return sorted(
        (r["k"], r["n"]) for r in pond.sql(f"SELECT k, n FROM {name}").collect()
    )


def _def_sql(table, view_def):
    kind, arg = view_def
    if kind == "filter":
        return f"SELECT id, k, v FROM lake.{table} WHERE k = {arg}"
    if kind == "cap":
        return f"SELECT id, k, v FROM lake.{table} WHERE id < {arg}"
    return f"SELECT k, count(*) AS n FROM lake.{table} GROUP BY k"


@pytest.mark.parametrize("seed", [5, 64])
def test_ddl_view_walk(spark, tmp_path, seed, plane):
    import os

    rng = random.Random(seed)
    root = str(tmp_path / f"pond_{seed}")
    pond = DeltaPond(spark, root)
    pond.sql("CREATE SCHEMA lake")
    table = "b"
    pond.sql(
        f"CREATE TABLE lake.{table} AS SELECT id, CAST(id % 4 AS INT) AS k, "
        "CAST(id AS DOUBLE) AS v FROM range(30)"
    )
    if plane == "light":
        from conftest import force_light_engaged

        force_light_engaged(os.path.join(root, "lake", table))
    views: dict[str, tuple] = {}  # name -> (kind, arg) model
    next_view = 0
    next_id = 1000
    comment = None

    for step in range(24):
        op = rng.choice(
            [
                "create", "replace", "alter_as", "rename_view", "drop",
                "insert", "delete", "rename_table", "comment",
                "collide_table", "collide_view", "show_create",
                "replace_table", "truncate",
            ]
        )
        if op == "create":
            name = f"vw{next_view}"
            next_view += 1
            vd = rng.choice([("filter", rng.randint(0, 3)), ("cap", rng.randint(5, 40)), ("agg", None)])
            pond.sql(f"CREATE VIEW {name} AS {_def_sql(table, vd)}")
            views[name] = vd
        elif op == "replace" and views:
            name = rng.choice(sorted(views))
            vd = rng.choice([("filter", rng.randint(0, 3)), ("agg", None)])
            pond.sql(f"CREATE OR REPLACE VIEW {name} AS {_def_sql(table, vd)}")
            views[name] = vd
        elif op == "alter_as" and views:
            name = rng.choice(sorted(views))
            vd = ("cap", rng.randint(5, 40))
            pond.sql(f"ALTER VIEW {name} AS {_def_sql(table, vd)}")
            views[name] = vd
        elif op == "rename_view" and views:
            name = rng.choice(sorted(views))
            new = f"vw{next_view}"
            next_view += 1
            pond.sql(f"ALTER VIEW {name} RENAME TO {new}")
            views[new] = views.pop(name)
        elif op == "drop" and views:
            name = rng.choice(sorted(views))
            pond.sql(f"DROP VIEW {name}")
            del views[name]
        elif op == "insert":
            lo = next_id
            next_id += 4
            pond.sql(
                f"INSERT INTO lake.{table} SELECT id + {lo}, "
                f"CAST(id % 4 AS INT), CAST(id AS DOUBLE) FROM range(4)"
            )
        elif op == "delete":
            kk = rng.randint(0, 3)
            cut = rng.randint(0, next_id)
            pond.sql(f"DELETE FROM lake.{table} WHERE k = {kk} AND id < {cut}")
        elif op == "rename_table":
            # rename away and back: views defined on the OLD name must
            # fail while it is gone, then resolve again after the rename
            # back (views bind by name at read time)
            pond.sql(f"ALTER TABLE lake.{table} RENAME TO lake.tmp_{table}")
            if views:
                name = rng.choice(sorted(views))
                with pytest.raises(Exception):
                    _read_view(pond, name, views[name])
            pond.sql(f"ALTER TABLE lake.tmp_{table} RENAME TO lake.{table}")
        elif op == "replace_table":
            # CREATE OR REPLACE TABLE over the base: same logical schema,
            # filtered content — every live view must re-resolve against
            # the REPLACED data on the very next read
            cut = rng.randint(0, next_id)
            pond.sql(
                f"CREATE OR REPLACE TABLE lake.{table} AS "
                f"SELECT id, k, v FROM lake.{table} WHERE id < {cut}"
            )
            # REPLACE resets metadata not re-specified (delta-spark
            # parity): the comment is gone
            comment = None
        elif op == "truncate":
            pond.sql(f"TRUNCATE TABLE lake.{table}")
        elif op == "comment":
            comment = f"walk step {step}"
            pond.sql(f"COMMENT ON TABLE lake.{table} IS '{comment}'")
        elif op == "collide_table" and views:
            # creating a table over a live view name must refuse
            name = rng.choice(sorted(views))
            with pytest.raises(ValueError):
                pond.sql(f"CREATE TABLE lake.{name} AS SELECT 1 AS x")
        elif op == "collide_view":
            with pytest.raises(ValueError):
                pond.sql(f"CREATE VIEW {table} AS SELECT 1 AS x")
            with pytest.raises(ValueError):
                pond.create_view(f"lake.{table}", "SELECT 1 AS x")
        elif op == "show_create":
            ddl = pond.sql(f"SHOW CREATE TABLE lake.{table}").first()[0]
            assert f"CREATE TABLE lake.{table}" in ddl

        # invariants after EVERY step
        rows = _base_rows(pond, table)
        for name, vd in views.items():
            assert _read_view(pond, name, vd) == _expected(vd, rows), (
                f"view {name} stale after step {step} op {op} (seed {seed})"
            )
        shown = {
            r.viewName for r in pond.sql("SHOW VIEWS").collect()
        }
        assert set(views) <= shown, f"missing views after {op}"
        assert not ({f"vw{i}" for i in range(next_view)} - set(views)) & shown, (
            f"dropped/renamed view still listed after {op}"
        )
        tables = {r.tableName for r in pond.sql("SHOW TABLES").collect()}
        assert table in tables and not (set(views) & tables)

    if comment is not None:
        # the comment lives in metaData.description and survives the walk
        # (renames, DML, checkpoints); SHOW CREATE TABLE renders it
        ddl = pond.sql(f"SHOW CREATE TABLE lake.{table}").first()[0]
        assert comment in ddl
