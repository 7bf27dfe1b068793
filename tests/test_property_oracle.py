"""Property-based spot checks vs DuckDB (SURVEY §5.6): random conjunctive
filters over the typed fixture — nulls, date boundaries, negations — must
produce identical row sets in both engines."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from athena_delta_lake_spark.queries.base import load

COLS = {
    "l_quantity": ("num", 1.0, 50.0),
    "l_discount": ("num", 0.0, 0.1),
    "l_extendedprice": ("num", 900.0, 100000.0),
    "l_returnflag": ("str", ["A", "N", "R"]),
    "l_linestatus": ("str", ["O", "F"]),
    "l_shipdate": ("date", "1992-01-01", "1998-12-01"),
}

_state = {}


def _setup(spark, sf_dir):
    if "con" not in _state:
        li = load(spark, sf_dir, "lineitem")
        li.createOrReplaceTempView("li_prop")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW li_prop AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
        )
        _state["con"] = con
        _state["spark"] = spark
    return _state["con"], _state["spark"]


@st.composite
def predicates(draw):
    n = draw(st.integers(1, 3))
    preds = []
    for _ in range(n):
        col = draw(st.sampled_from(sorted(COLS)))
        kind = COLS[col][0]
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
        if kind == "num":
            lo, hi = COLS[col][1], COLS[col][2]
            v = round(draw(st.floats(lo, hi, allow_nan=False)), 2)
            preds.append(f"{col} {op} {v}")
        elif kind == "str":
            v = draw(st.sampled_from(COLS[col][1]))
            preds.append(f"{col} {op} '{v}'")
        else:
            y = draw(st.integers(1992, 1998))
            m = draw(st.integers(1, 12))
            preds.append(f"CAST({col} AS DATE) {op} DATE '{y}-{m:02d}-01'")
    return " AND ".join(preds)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=predicates())
def test_random_filters_match_duckdb(spark, sf_dir, where):
    con, spark_ = _setup(spark, sf_dir)
    sql = (
        "SELECT count(*) AS n, count(DISTINCT l_orderkey) AS k, "
        f"CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q FROM li_prop WHERE {where}"
    )
    got = spark_.sql(sql).collect()[0]
    want = con.execute(sql).fetchone()
    assert (got["n"], got["k"], got["q"]) == want, where
