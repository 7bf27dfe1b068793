"""Round-start sanity check for the driver fixtures.

The fixtures under /root/testdata are DRIVER-OWNED and may be regenerated
between rounds with different physical types (observed: events.ts went
TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) mid-round, silently mis-scaling any
reader that hardcoded the nanos path). Run this before building on top of
fixture assumptions; it prints one line per table per sf and exits non-zero
on structural surprises (missing tables/columns).

Usage: python tools/preflight.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

EXPECTED_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
KEY_COLUMNS = {
    "events": ["event_id", "ts", "user_id", "event_type", "value"],
    "documents": ["doc_id", "text", "lang", "source"],
    "embeddings": ["vec_id", "embedding", "label"],
    "lineitem": ["l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"],
}


def main(dirs: list[str]) -> int:
    rc = 0
    for sf_dir in dirs:
        for t in EXPECTED_TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(p):
                print(f"MISSING {p}")
                rc = 1
                continue
            f = pq.ParquetFile(p)
            sch = f.schema_arrow
            missing = [c for c in KEY_COLUMNS.get(t, []) if c not in sch.names]
            if missing:
                print(f"SCHEMA  {p}: missing columns {missing}")
                rc = 1
            ts_types = {
                fld.name: str(fld.type)
                for fld in sch
                if str(fld.type).startswith("timestamp")
            }
            print(
                f"ok      {sf_dir}/{t}: rows={f.metadata.num_rows} "
                f"cols={len(sch.names)}"
                + (f" ts={ts_types}" if ts_types else "")
            )
    return rc


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ]
    raise SystemExit(main(dirs))
