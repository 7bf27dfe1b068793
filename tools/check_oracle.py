"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at the given sf_dir on Spark AND its oracle_sql()
on DuckDB, compares row count, schema (column names), and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Prints one line per query + a summary.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from athena_delta_lake_spark.queries.base import TABLES


def canon(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.10g}"
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return canon(f)
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from athena_delta_lake_spark import get_spark
    from athena_delta_lake_spark.queries import registry

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    reg = registry()
    names = [n for n in sorted(reg) if not only or n in only]
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        qd = reg[name]
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if qd.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only) [{dt:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(qd.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            sh = table_hash(s_cols, [tuple(r) for r in s_rows])
            dh = table_hash(d_cols, d_rows)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
                # show first diff
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in s_rows)
                ld = sorted("|".join(canon(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"first diff:\n  spark : {a}\n  duckdb: {b}")
                        break
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems[:3])}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows [{dt:.1f}s]")
            n_pass += 1
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only, "
        f"{len(names)} total"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
