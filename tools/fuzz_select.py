"""SELECT-surface conformance fuzzer: seeded random relational plans
(join chains, filters, grouped aggregates, window functions, set
operations, IN-subqueries, HAVING) rendered as engine-portable ANSI SQL
and executed verbatim on BOTH Spark (through the repo's load() path) and
DuckDB over the same parquet fixtures, with multiset equality asserted
per statement.

The generated SQL deliberately stays inside the dialect intersection:

- floats are never round()ed in SQL (Spark rounds half-up, DuckDB
  half-even); results are compared elementwise with relative tolerance
  1e-6 after a 6-significant-digit-stable row sort (sum-order noise
  across engines is ~n*ulp ≈ 1e-12 relative at fixture scale; hard
  quantization instead would fail on values that happen to straddle a
  rounding boundary — observed on grouped sums);
- every ORDER BY is a genuinely TOTAL order: the concatenation of all
  chain tables' key columns (join fan-out makes any single table's keys
  non-unique, and the fixture's lineitem itself has duplicate
  (l_orderkey, l_linenumber) pairs), and order keys never compare NULL
  against non-NULL (Spark sorts NULLs first ASC, DuckDB last);
- set operations run over raw stored columns only (computed doubles
  could differ in the last ulp and break set semantics);
- timestamps appear only as CAST(... AS DATE) group keys.

Usage:
    python tools/fuzz_select.py [seed ...]        # default seeds 11 42 77
    SPARK_GRAFT_TEST_SF_DIR=... python tools/fuzz_select.py
"""

from __future__ import annotations

import datetime
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

# join chains over the fixture FK graph (FIXTURES.md §3); each entry is
# (tables, FROM clause). LEFT variants put the PARENT on the left so the
# outer side is the 1-side of the 1:N relation.
CHAINS = [
    (("nation", "region"),
     "nation JOIN region ON n_regionkey = r_regionkey"),
    (("customer", "nation"),
     "customer JOIN nation ON c_nationkey = n_nationkey"),
    (("customer", "nation", "region"),
     "customer JOIN nation ON c_nationkey = n_nationkey "
     "JOIN region ON n_regionkey = r_regionkey"),
    (("orders", "customer"),
     "orders JOIN customer ON o_custkey = c_custkey"),
    (("orders", "customer", "nation"),
     "orders JOIN customer ON o_custkey = c_custkey "
     "JOIN nation ON c_nationkey = n_nationkey"),
    (("lineitem", "orders"),
     "lineitem JOIN orders ON l_orderkey = o_orderkey"),
    (("lineitem", "supplier"),
     "lineitem JOIN supplier ON l_suppkey = s_suppkey"),
    (("lineitem", "part"),
     "lineitem JOIN part ON l_partkey = p_partkey"),
    (("supplier", "nation"),
     "supplier JOIN nation ON s_nationkey = n_nationkey"),
    (("customer", "orders"),
     "customer LEFT JOIN orders ON o_custkey = c_custkey"),
    (("orders", "lineitem"),
     "orders LEFT JOIN lineitem ON l_orderkey = o_orderkey"),
]

# predicate pools per table: (sql template, arg generator)
PREDICATES = {
    "nation": [
        lambda r: f"n_regionkey <= {r.randint(0, 4)}",
        lambda r: f"n_name LIKE '{r.choice('ABCDEFGIJKMPRSUV')}%'",
        lambda r: f"n_nationkey BETWEEN {r.randint(0, 10)} AND {r.randint(11, 24)}",
    ],
    "region": [
        lambda r: f"r_regionkey <> {r.randint(0, 4)}",
    ],
    "customer": [
        lambda r: f"c_acctbal > {r.randint(-900, 8000)}",
        lambda r: f"c_mktsegment IN ('{r.choice(['AUTOMOBILE', 'BUILDING'])}', 'MACHINERY')",
        lambda r: f"c_nationkey < {r.randint(5, 25)}",
        lambda r: f"length(c_name) > {r.randint(8, 14)}",
    ],
    "supplier": [
        lambda r: f"s_acctbal >= {r.randint(-900, 8000)}",
        lambda r: f"s_nationkey IN ({r.randint(0, 12)}, {r.randint(13, 24)})",
    ],
    "part": [
        lambda r: f"p_size BETWEEN {r.randint(1, 20)} AND {r.randint(21, 50)}",
        lambda r: f"p_brand = 'Brand#{r.randint(1, 5)}'",
        lambda r: f"p_retailprice < {r.randint(500, 2000)}",
    ],
    "orders": [
        lambda r: f"o_totalprice > {r.randint(1000, 200000)}",
        lambda r: f"o_orderstatus = '{r.choice('OFP')}'",
        lambda r: f"o_orderpriority LIKE '{r.randint(1, 5)}%'",
        lambda r: f"o_orderkey % {r.randint(2, 7)} = 0",
    ],
    "lineitem": [
        lambda r: f"l_quantity >= {r.randint(1, 45)}",
        lambda r: f"l_discount < 0.0{r.randint(1, 9)}",
        lambda r: f"l_returnflag = '{r.choice('RAN')}'",
        lambda r: f"l_linenumber <= {r.randint(1, 6)}",
    ],
}

# group-by key pool: (table, sql expr, alias)
GROUP_KEYS = {
    "nation": [("n_regionkey", "gk_nr"), ("n_name", "gk_nn")],
    "region": [("r_name", "gk_rn")],
    "customer": [("c_mktsegment", "gk_seg"), ("c_nationkey", "gk_cn")],
    "supplier": [("s_nationkey", "gk_sn")],
    "part": [("p_brand", "gk_pb"), ("p_size % 10", "gk_ps")],
    "orders": [
        ("o_orderstatus", "gk_os"),
        ("o_orderpriority", "gk_op"),
        ("CAST(o_orderdate AS DATE)", "gk_od"),
    ],
    "lineitem": [("l_returnflag", "gk_rf"), ("l_linestatus", "gk_ls")],
}

# aggregate pool: table -> (sql template, alias prefix)
AGG_COLS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice", "p_size"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
}

# key tuple per table that totally orders ITS rows. lineitem has duplicate
# (l_orderkey, l_linenumber) pairs in the fixture (1161 at sf0.001) but no
# full-duplicate rows, so distinguishing columns are included. A total
# order over a JOIN result is the concatenation of every chain table's
# keys (fan-out duplicates any single table's keys).
UNIQUE_KEYS = {
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": [
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        "l_quantity",
        "l_discount",
    ],
}


def _total_order(tables: tuple[str, ...]) -> list[str]:
    """Concatenated per-table keys: a total order over the join result.
    For LEFT JOIN chains the right side's keys are NULL only on unmatched
    rows, and an unmatched parent contributes exactly ONE row — so the
    engines' opposite NULL placement never has a tie to break."""
    keys: list[str] = []
    for t in tables:
        keys.extend(UNIQUE_KEYS[t])
    return list(dict.fromkeys(keys))

PROJ_COLS = {
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "region": ["r_regionkey", "r_name"],
    "customer": ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"],
    "supplier": ["s_suppkey", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_brand", "p_size"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    "lineitem": [
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    ],
}


# scalar expression pool per table: engine-portable string/math/date/CASE
# expressions (no round(): half-up vs half-even; no division: int '/'
# semantics differ by dialect history)
SCALAR_EXPRS = {
    "nation": [
        "upper(n_name)",
        "substring(n_name, 2, 3)",
        "length(n_name)",
        "concat(n_name, '_', CAST(n_regionkey AS STRING))",
        "replace(n_name, 'A', '@')",
    ],
    "region": ["lower(r_name)"],
    "customer": [
        "abs(c_acctbal)",
        "CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'neg' END",
        "upper(c_mktsegment)",
        "length(trim(c_name))",
    ],
    "supplier": ["abs(s_acctbal)", "substring(s_name, 1, 6)"],
    "part": [
        "CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END",
        "concat(p_brand, ':', CAST(p_size AS STRING))",
    ],
    "orders": [
        "EXTRACT(YEAR FROM CAST(o_orderdate AS DATE))",
        "EXTRACT(MONTH FROM CAST(o_orderdate AS DATE))",
        "CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END",
        "upper(o_orderstatus)",
    ],
    "lineitem": [
        "floor(l_quantity)",
        "ceil(l_extendedprice)",
        "sqrt(abs(l_extendedprice))",
        "l_extendedprice * (1 - l_discount)",
        "CASE l_returnflag WHEN 'R' THEN 'returned' ELSE 'kept' END",
    ],
}

# correlated EXISTS templates: (outer table, inner subquery with a
# correlation on the FK and a parameterized filter)
EXISTS_TEMPLATES = [
    ("customer",
     "SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > {x}"),
    ("orders",
     "SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= {q}"),
    ("supplier",
     "SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_discount < 0.0{d}"),
    ("nation",
     "SELECT 1 FROM customer WHERE c_nationkey = n_nationkey AND c_acctbal > {x}"),
]


def _where(rng: random.Random, tables: tuple[str, ...], outer_right: str | None = None) -> str:
    """0-2 predicates over the chain's tables. Predicates never touch the
    null-extended right side of a LEFT JOIN (a filter there silently
    turns the join inner in BOTH engines — legal but uninteresting)."""
    pool = []
    for t in tables:
        if t == outer_right:
            continue
        pool.extend(PREDICATES[t])
    n = rng.randint(0, 2)
    if not n:
        return ""
    preds = [rng.choice(pool)(rng) for _ in range(n)]
    return " WHERE " + " AND ".join(preds)


def _chain(rng: random.Random):
    tables, frm = rng.choice(CHAINS)
    outer_right = None
    if " LEFT JOIN " in frm:
        outer_right = tables[1]
    return tables, frm, outer_right


def gen_query(rng: random.Random) -> tuple[str, bool]:
    """Returns (sql, ordered): ordered=True when the result carries a
    TOTAL order (compare as lists), else compare as multisets."""
    shape = rng.choice(
        [
            "project", "agg", "agg", "window", "setop", "in_subquery",
            "having", "scalar", "exists", "distinct", "agg_distinct",
            "cross", "setop_hetero", "scalar_sub",
        ]
    )
    if shape == "cross":
        # tiny-dim cross product (125 rows max): broadcastable by any
        # engine, exercises the one join shape the FK chains never emit
        w = _where(rng, ("nation", "region"))
        return (
            "SELECT n_nationkey, r_regionkey, n_name, r_name "
            f"FROM nation CROSS JOIN region{w} "
            "ORDER BY n_nationkey, r_regionkey",
            True,
        )
    if shape == "setop_hetero":
        # set op across DIFFERENT relations, aligned on one BIGINT column
        a_t, a_c = rng.choice(
            [("customer", "c_custkey"), ("orders", "o_orderkey"),
             ("supplier", "s_suppkey"), ("part", "p_partkey")]
        )
        b_t, b_c = rng.choice(
            [("orders", "o_custkey"), ("lineitem", "l_orderkey"),
             ("lineitem", "l_suppkey"), ("lineitem", "l_partkey")]
        )
        op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        wa = _where(rng, (a_t,))
        wb = _where(rng, (b_t,))
        return (
            f"SELECT {a_c} AS k FROM {a_t}{wa} {op} "
            f"SELECT {b_c} AS k FROM {b_t}{wb}",
            False,
        )
    if shape == "scalar_sub":
        outer_t, fk, inner_t, inner_fk, inner_val = rng.choice(
            [
                ("nation", "n_nationkey", "customer", "c_nationkey", "c_acctbal"),
                ("nation", "n_nationkey", "supplier", "s_nationkey", "s_acctbal"),
                ("region", "r_regionkey", "nation", "n_regionkey", "n_nationkey"),
            ]
        )
        keys = UNIQUE_KEYS[outer_t]
        return (
            f"SELECT {', '.join(keys)}, "
            f"(SELECT count(*) FROM {inner_t} WHERE {inner_fk} = {fk}) AS sub_n, "
            f"(SELECT max({inner_val}) FROM {inner_t} WHERE {inner_fk} = {fk}) AS sub_m "
            f"FROM {outer_t} ORDER BY {', '.join(keys)}",
            True,
        )
    if shape == "scalar":
        tables, frm, outer = _chain(rng)
        keys = _total_order(tables)
        pool = []
        for t in tables:
            if t != outer:
                pool.extend(SCALAR_EXPRS[t])
        exprs = rng.sample(pool, min(len(pool), rng.randint(2, 3)))
        sel = ", ".join(
            keys + [f"{e} AS e{i}" for i, e in enumerate(exprs)]
        )
        return (
            f"SELECT {sel} FROM {frm}{_where(rng, tables, outer)} "
            f"ORDER BY {', '.join(keys)} LIMIT {rng.randint(20, 300)}",
            True,
        )
    if shape == "exists":
        t, sub = rng.choice(EXISTS_TEMPLATES)
        sub = sub.format(
            x=rng.randint(1000, 150000),
            q=rng.randint(10, 45),
            d=rng.randint(1, 9),
        )
        neg = rng.choice(["EXISTS", "NOT EXISTS"])
        gexpr, galias = rng.choice(GROUP_KEYS[t])
        return (
            f"SELECT {gexpr} AS {galias}, count(*) AS n FROM {t} "
            f"WHERE {neg} ({sub}) GROUP BY {gexpr}",
            False,
        )
    if shape == "distinct":
        tables, frm, outer = _chain(rng)
        pool = []
        for t in tables:
            pool.extend(PROJ_COLS[t][:3])
        cols = rng.sample(pool, rng.randint(1, 2))
        return (
            f"SELECT DISTINCT {', '.join(cols)} "
            f"FROM {frm}{_where(rng, tables, outer)}",
            False,
        )
    if shape == "agg_distinct":
        tables, frm, outer = _chain(rng)
        gt = rng.choice([t for t in tables if t != outer])
        gexpr, galias = rng.choice(GROUP_KEYS[gt])
        dcol = rng.choice(AGG_COLS[rng.choice(tables)])
        return (
            f"SELECT {gexpr} AS {galias}, count(DISTINCT {dcol}) AS nd, "
            f"sum(DISTINCT {dcol}) AS sd, count(*) AS n "
            f"FROM {frm}{_where(rng, tables, outer)} GROUP BY {gexpr}",
            False,
        )
    if shape == "project":
        tables, frm, outer = _chain(rng)
        cols = []
        for t in tables:
            cols.extend(rng.sample(PROJ_COLS[t], rng.randint(1, 2)))
        keys = _total_order(tables)
        sel = ", ".join(dict.fromkeys(keys + cols))
        lim = rng.randint(7, 400)
        return (
            f"SELECT {sel} FROM {frm}{_where(rng, tables, outer)} "
            f"ORDER BY {', '.join(keys)} LIMIT {lim}",
            True,
        )
    if shape in ("agg", "having"):
        tables, frm, outer = _chain(rng)
        inner_t = [t for t in tables if t != outer]
        # one or two group keys (distinct aliases), possibly cross-table
        picks = {galias: gexpr
                 for gexpr, galias in (rng.choice(GROUP_KEYS[rng.choice(inner_t)])
                                       for _ in range(1 + (rng.random() < 0.4)))}
        gsel = ", ".join(f"{e} AS {a}" for a, e in picks.items())
        gby = ", ".join(picks.values())
        at = rng.choice(tables)
        acol = rng.choice(AGG_COLS[at])
        aggs = [
            "count(*) AS n",
            f"count({acol}) AS n_nonnull",
            f"sum({acol}) AS s",
            f"min({acol}) AS lo",
            f"max({acol}) AS hi",
            f"avg({acol}) AS mean",
        ]
        picked = rng.sample(aggs, rng.randint(2, 4))
        having = ""
        if shape == "having":
            having = f" HAVING count(*) > {rng.randint(1, 20)}"
            if "count(*) AS n" not in picked:
                picked.append("count(*) AS n")
        return (
            f"SELECT {gsel}, {', '.join(picked)} "
            f"FROM {frm}{_where(rng, tables, outer)} GROUP BY {gby}{having}",
            False,
        )
    if shape == "window":
        tables, frm, outer = _chain(rng)
        keys = _total_order(tables)
        inner_t = [t for t in tables if t != outer]
        part_t = rng.choice(inner_t)
        pexpr, _ = rng.choice(GROUP_KEYS[part_t])
        # vcol never comes from the null-extended side: NULL placement in
        # window ORDER BY differs by dialect (Spark first, DuckDB last)
        vcol = rng.choice(AGG_COLS[rng.choice(inner_t)])
        order = ", ".join([f"{vcol} DESC"] + keys)
        if rng.random() < 0.3:
            # tie-ranking functions: deterministic under TIES (unlike
            # row_number), so order by the value alone — this is exactly
            # where engines can disagree on tie semantics
            fn = rng.choice(
                [
                    "rank() OVER w AS rnk",
                    "dense_rank() OVER w AS drnk",
                    "percent_rank() OVER w AS prnk",
                    "cume_dist() OVER w AS cd",
                ]
            )
            wdef = f" WINDOW w AS (PARTITION BY {pexpr} ORDER BY {vcol} DESC)"
            inner_cols = list(dict.fromkeys(keys + [vcol]))
            inner = (
                f"SELECT {', '.join(inner_cols)}, {fn} "
                f"FROM {frm}{_where(rng, tables, outer)}{wdef}"
            )
            return f"SELECT * FROM ({inner}) t ORDER BY {', '.join(keys)}", True
        fn = rng.choice(
            [
                "row_number() OVER w AS rn",
                f"sum({vcol}) OVER (PARTITION BY {pexpr} ORDER BY {order} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running",
                f"lag({vcol}) OVER w AS prev_v",
            ]
        )
        wdef = f" WINDOW w AS (PARTITION BY {pexpr} ORDER BY {order})"
        inner_cols = list(dict.fromkeys(keys + [vcol]))
        inner = (
            f"SELECT {', '.join(inner_cols)}, {fn} "
            f"FROM {frm}{_where(rng, tables, outer)}{wdef if 'OVER w' in fn else ''}"
        )
        if rng.random() < 0.5 and fn.startswith("row_number()"):
            return (
                f"SELECT * FROM ({inner}) t WHERE rn <= {rng.randint(1, 5)} "
                f"ORDER BY {', '.join(keys)}",
                True,
            )
        return f"SELECT * FROM ({inner}) t ORDER BY {', '.join(keys)}", True
    if shape == "setop":
        tables, frm, outer = _chain(rng)
        cols = PROJ_COLS[tables[0]][:2]
        op = rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        a = f"SELECT {', '.join(cols)} FROM {frm}{_where(rng, tables, outer)}"
        b = f"SELECT {', '.join(cols)} FROM {frm}{_where(rng, tables, outer)}"
        return f"{a} {op} {b}", False
    # in_subquery
    sub = rng.choice(
        [
            ("orders", "o_custkey",
             "SELECT c_custkey FROM customer WHERE c_acctbal > {x}"),
            ("lineitem", "l_orderkey",
             "SELECT o_orderkey FROM orders WHERE o_totalprice > {x}"),
            ("customer", "c_nationkey",
             "SELECT n_nationkey FROM nation WHERE n_regionkey <= {x4}"),
        ]
    )
    t, col, subq = sub
    subq = subq.format(x=rng.randint(1000, 100000), x4=rng.randint(0, 4))
    neg = rng.choice(["IN", "NOT IN"])
    gexpr, galias = rng.choice(GROUP_KEYS[t])
    return (
        f"SELECT {gexpr} AS {galias}, count(*) AS n FROM {t} "
        f"WHERE {col} {neg} ({subq}) GROUP BY {gexpr}",
        False,
    )


# --------------------------------------------------------------- comparison


def _norm(v):
    """Native-type normalization: numpy scalars -> python, datetimes kept."""
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.integer):
            return int(v)
    except ImportError:
        pass
    return v


def _sort_key(row) -> tuple:
    """Engine-stable row sort key: floats quantized to 6 significant
    digits so cross-engine sum-order noise (~1e-12 relative) can never
    reorder rows; full-precision compare happens elementwise after
    alignment."""
    out = []
    for v in row:
        if v is None:
            out.append((0, ""))
        elif isinstance(v, bool):
            out.append((1, str(v)))
        elif isinstance(v, float):
            out.append((2, f"{v:.6g}"))
        elif isinstance(v, int):
            out.append((2, f"{v:.6g}"))
        elif isinstance(v, (datetime.datetime, datetime.date)):
            out.append((3, v.isoformat()))
        else:
            out.append((4, str(v)))
    return tuple(out)


def _val_eq(a, b, rel=1e-6, abs_=1e-9) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            import math

            return math.isclose(float(a), float(b), rel_tol=rel, abs_tol=abs_)
        except (TypeError, ValueError):
            return False
    if isinstance(a, datetime.datetime) and isinstance(b, datetime.date):
        pass  # fall through to generic compare
    return a == b


def rows_equal(s_rows, d_rows, ordered: bool) -> tuple[bool, list]:
    """(equal, first-diffs). Floats compare with relative tolerance
    (quantizing instead would fail on values straddling a rounding
    boundary by ~1e-12 — observed in practice on grouped sums)."""
    if len(s_rows) != len(d_rows):
        return False, [("row count", len(s_rows), len(d_rows))]
    a = [tuple(_norm(v) for v in r) for r in s_rows]
    b = [tuple(_norm(v) for v in r) for r in d_rows]
    if not ordered:
        a = sorted(a, key=_sort_key)
        b = sorted(b, key=_sort_key)
    diffs = []
    for ra, rb in zip(a, b):
        if len(ra) != len(rb) or not all(
            _val_eq(x, y) for x, y in zip(ra, rb)
        ):
            diffs.append((ra, rb))
            if len(diffs) >= 3:
                break
    return not diffs, diffs


def run_seed(spark, con, seed: int, n_queries: int = 30, run_sql=None) -> list[dict]:
    """Generate and cross-check n_queries; returns the divergences.
    `run_sql` overrides how the Spark side executes a statement (default
    spark.sql) — e.g. pond.sql to fuzz the metastore-less catalog's
    relation resolution and splicing too."""
    rng = random.Random(seed)
    exec_sql = run_sql or spark.sql
    failures = []
    for i in range(n_queries):
        sql, ordered = gen_query(rng)
        try:
            s_rows = [tuple(r) for r in exec_sql(sql).collect()]
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
        except Exception as e:  # dialect crack, not a wrong answer
            failures.append({"seed": seed, "i": i, "sql": sql, "error": str(e)[:300]})
            continue
        ok, diffs = rows_equal(s_rows, d_rows, ordered)
        if not ok:
            failures.append(
                {
                    "seed": seed,
                    "i": i,
                    "sql": sql,
                    "spark_rows": len(s_rows),
                    "duck_rows": len(d_rows),
                    "first_diffs": diffs,
                }
            )
    return failures


def bind_spark_tables(spark, sf_dir: str, delta: bool = False) -> None:
    """Register the fixture tables as temp views — either straight
    parquet reads, or (delta=True) NATIVE Delta tables materialized once
    under /tmp and read through log replay + the engine's scan path, so
    the fuzzer exercises snapshot resolution and file pruning too."""
    from athena_delta_lake_spark.queries.base import load

    if not delta:
        for t in TABLES:
            load(spark, sf_dir, t).createOrReplaceTempView(t)
        return
    from athena_delta_lake_spark.delta.table import DeltaTable
    from athena_delta_lake_spark.delta.writer import write_delta

    root = os.path.join(
        "/tmp/adls_fuzz_delta", os.path.basename(sf_dir.rstrip("/"))
    )
    for t in TABLES:
        path = os.path.join(root, t)
        if not os.path.isdir(os.path.join(path, "_delta_log")):
            write_delta(load(spark, sf_dir, t).repartition(4), path)
        DeltaTable(spark, path).to_df().createOrReplaceTempView(t)


def make_pond(spark, sf_dir: str):
    """A DeltaPond whose `lake` schema holds every fixture table as a
    native Delta table — pond.sql must resolve each bare relation from
    the storage layout (no pre-bound views)."""
    from athena_delta_lake_spark.catalog import DeltaPond
    from athena_delta_lake_spark.delta.writer import write_delta
    from athena_delta_lake_spark.queries.base import load

    root = os.path.join(
        "/tmp/adls_fuzz_pond", os.path.basename(sf_dir.rstrip("/"))
    )
    os.makedirs(os.path.join(root, "lake"), exist_ok=True)
    for t in TABLES:
        path = os.path.join(root, "lake", t)
        if not os.path.isdir(os.path.join(path, "_delta_log")):
            write_delta(load(spark, sf_dir, t).repartition(4), path)
        # bare names must resolve through the POND, not stale temp views
        spark.catalog.dropTempView(t)
    return DeltaPond(spark, root)


def make_engines(sf_dir: str, delta: bool = False):
    import duckdb

    from athena_delta_lake_spark import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    bind_spark_tables(spark, sf_dir, delta=delta)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return spark, con


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    args = [a for a in sys.argv[1:] if a != "--delta"]
    delta = "--delta" in sys.argv[1:]
    seeds = [int(a) for a in args] or [11, 42, 77]
    spark, con = make_engines(sf_dir, delta=delta)
    bad = []
    for s in seeds:
        f = run_seed(spark, con, s)
        print(f"seed {s}: {'OK' if not f else f'{len(f)} divergences'}")
        bad.extend(f)
    for b in bad:
        print(b)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
