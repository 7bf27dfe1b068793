"""Regenerate the /root/testdata synthetic fixtures (TPC-H-ish star schema
+ events/documents/embeddings) after they were accidentally deleted this
session by a faulty cleanup command (`rm -rf /root/testdata/../testdata`).

This is a reconstruction, not the original driver generator: schemas, row
counts, value domains and cross-table relationships follow FIXTURES.md /
TESTDATA.md and the literal predicates used by the repo's own gates (so
every gate stays non-degenerate; float columns stay CONTINUOUS —
lattice-rounded money values put aggregate sums on exact round-half
boundaries where engines legitimately disagree), but exact values differ from the
driver's seed-42 stream. Correctness gates are unaffected — they compare
the Spark engine against the DuckDB oracle over the SAME files.

Usage: python tools/regen_testdata.py [sf ...]   (default: 0.001 0.01 0.1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Output root override for generating EXTRA scale factors (e.g. sf1 for
# the scaling study) without touching the driver's read-only fixtures.
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
COLORS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blue", "blush", "brown", "burlywood", "chartreuse", "chocolate",
    "coral", "cornflower", "cream", "cyan", "red", "rose", "green",
]
NOUNS = ["widget", "gadget", "sprocket", "gear", "valve", "bolt", "fitting"]
TYPE1 = ["PROMO", "STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY"]
TYPE2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "login"]

# stopword-rich per-language vocabulary (matches the lang-ID gate's lists)
LANG_STOP = {
    "en": ["the", "and", "of", "is", "that", "with", "for", "to", "in", "it"],
    "fr": ["le", "la", "les", "de", "des", "un", "une", "et", "est", "que"],
    "de": ["der", "die", "das", "den", "ein", "und", "ist", "mit", "von", "nicht"],
    "es": ["el", "la", "los", "es", "en", "un", "de", "que", "por", "con"],
}
CONTENT = [
    "spark", "data", "engine", "pipeline", "query", "table", "index",
    "stream", "batch", "vector", "model", "training", "cluster", "shuffle",
    "partition", "storage", "format", "schema", "metric", "report",
    "analysis", "system", "result", "process", "update", "record",
]
SOURCES = ["web", "wiki", "news", "forum", "docs"]
BOILER = {
    "web": "this page is provided as is without any warranty of any kind",
    "wiki": "this article needs additional citations for verification please help improve it",
    "news": "all rights reserved reproduction without permission is strictly prohibited",
    "forum": "posts represent the views of their authors and not of this site",
    "docs": "see the reference manual for the complete list of supported options",
}

DAY_US = 86_400_000_000


def _ts_us(date_str: str) -> int:
    import datetime as dt

    d = dt.datetime.fromisoformat(date_str)
    return int(d.timestamp() * 1_000_000)


def _write(path: str, table: pa.Table) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path, compression="snappy")
    print(f"  {path}: {table.num_rows} rows")


def gen_sf(sf: float) -> None:
    rng = np.random.default_rng(42)
    out = os.path.join(ROOT, f"sf{sf:g}")
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(50_000 * sf)

    # region / nation -------------------------------------------------------
    _write(
        os.path.join(out, "region.parquet"),
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(REGIONS),
            }
        ),
    )
    _write(
        os.path.join(out, "nation.parquet"),
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([n for n, _ in NATIONS]),
                "n_regionkey": pa.array([r for _, r in NATIONS], pa.int32()),
            }
        ),
    )

    # customer --------------------------------------------------------------
    _write(
        os.path.join(out, "customer.parquet"),
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, n_cust + 1), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n_cust + 1)]),
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
                "c_acctbal": pa.array(rng.uniform(-999.99, 9999.99, n_cust)),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )

    # supplier ---------------------------------------------------------------
    _write(
        os.path.join(out, "supplier.parquet"),
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(1, n_supp + 1), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(1, n_supp + 1)]),
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
                "s_acctbal": pa.array(rng.uniform(-999.99, 9999.99, n_supp)),
            }
        ),
    )

    # part -------------------------------------------------------------------
    c1 = rng.integers(0, len(COLORS), n_part)
    c2 = rng.integers(0, len(COLORS), n_part)
    nn = rng.integers(0, len(NOUNS), n_part)
    p_name = [f"{COLORS[a]} {COLORS[b]} {NOUNS[c]}" for a, b, c in zip(c1, c2, nn)]
    p_type = [
        f"{TYPE1[a]} {TYPE2[b]} {TYPE3[c]}"
        for a, b, c in zip(
            rng.integers(0, 6, n_part),
            rng.integers(0, 5, n_part),
            rng.integers(0, 5, n_part),
        )
    ]
    part_price = rng.uniform(900.0, 2000.0, n_part)
    _write(
        os.path.join(out, "part.parquet"),
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, n_part + 1), pa.int64()),
                "p_name": pa.array(p_name),
                "p_brand": pa.array(
                    [f"Brand#{b}" for b in rng.integers(1, 6, n_part)]
                ),
                "p_type": pa.array(p_type),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": pa.array(part_price),
            }
        ),
    )

    # orders -----------------------------------------------------------------
    o_date_lo = _ts_us("1992-01-01")
    o_date_hi = _ts_us("1998-08-02")
    o_orderdate = rng.integers(o_date_lo // DAY_US, o_date_hi // DAY_US, n_ord) * DAY_US
    # ~10% of customers never order (anti-join / NOT EXISTS coverage)
    cust_keys = np.arange(1, n_cust + 1)
    eligible = cust_keys[cust_keys % 10 != 7]
    o_custkey = rng.choice(eligible, n_ord)
    _write(
        os.path.join(out, "orders.parquet"),
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, n_ord + 1), pa.int64()),
                "o_custkey": pa.array(o_custkey, pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[
                        rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])
                    ]
                ),
                "o_totalprice": pa.array(rng.uniform(1000.0, 400_000.0, n_ord)),
                "o_orderdate": pa.array(o_orderdate, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    # lineitem ---------------------------------------------------------------
    # 1..7 items per order (avg 4) over a random order subset until ~6M*sf
    n_li_target = int(6_000_000 * sf)
    # last ~2% of orders carry no lineitems (outer-join coverage)
    n_ord_li = max(1, int(n_ord * 0.98))
    per_order = rng.integers(1, 8, n_ord_li)
    cum = np.cumsum(per_order)
    n_orders_used = min(n_ord_li, int(np.searchsorted(cum, n_li_target) + 1))
    per_order = per_order[:n_orders_used]
    l_orderkey = np.repeat(np.arange(1, n_orders_used + 1), per_order)
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, k + 1) for k in per_order])
    l_partkey = rng.integers(1, max(n_part, 2) + 1, n_li)
    l_suppkey = rng.integers(1, max(n_supp, 2) + 1, n_li)
    l_quantity = rng.integers(1, 51, n_li).astype(np.float64)
    l_extendedprice = l_quantity * part_price[l_partkey - 1]
    l_discount = np.round(rng.integers(0, 11, n_li) / 100.0, 2)
    l_tax = np.round(rng.integers(0, 9, n_li) / 100.0, 2)
    ship_lag = rng.integers(1, 122, n_li) * DAY_US
    l_shipdate = o_orderdate[l_orderkey - 1] + ship_lag
    _write(
        os.path.join(out, "lineitem.parquet"),
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(l_partkey, pa.int64()),
                "l_suppkey": pa.array(l_suppkey, pa.int64()),
                "l_linenumber": pa.array(l_linenumber, pa.int32()),
                "l_quantity": pa.array(l_quantity),
                "l_extendedprice": pa.array(l_extendedprice),
                "l_discount": pa.array(l_discount),
                "l_tax": pa.array(l_tax),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[
                        rng.choice(3, n_li, p=[0.25, 0.5, 0.25])
                    ]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": pa.array(l_shipdate, pa.timestamp("us")),
            }
        ),
    )

    # events ----------------------------------------------------------------
    # fixed 30-day window at every sf (720 hourly buckets x 5 types = the
    # 3600-row gap-fill axis), ordered-ish with ~5% late (>10 min) events
    ev_lo = _ts_us("2024-01-01T00:00:30")
    ev_hi = _ts_us("2024-01-30T23:59:00")
    ts = np.sort(rng.integers(ev_lo, ev_hi, n_ev))
    ts[0], ts[-1] = ev_lo, ev_hi  # pin the hourly axis
    late = rng.random(n_ev) < 0.05
    late[0] = late[-1] = False
    ts = np.where(late, ts - rng.integers(600, 3600, n_ev) * 1_000_000, ts)
    n_users = max(10, n_ev // 100)
    k_vals = rng.integers(0, 1000, n_ev)
    has_k = rng.random(n_ev) < 0.85
    props = [
        json.dumps({"k": int(k), "src": "web" if k % 2 else "app"})
        if h
        else ("{}" if i % 3 else json.dumps({"other": 1}))
        for i, (k, h) in enumerate(zip(k_vals, has_k))
    ]
    _write(
        os.path.join(out, "events.parquet"),
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(1, n_users + 1, n_ev), pa.int64()
                ),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[
                        rng.choice(5, n_ev, p=[0.35, 0.3, 0.15, 0.1, 0.1])
                    ]
                ),
                "value": pa.array(rng.uniform(0, 100, n_ev)),
                "props": pa.array(props),
            }
        ),
    )

    # documents --------------------------------------------------------------
    langs = list(LANG_STOP)
    lang_pick = rng.choice(4, n_doc, p=[0.55, 0.15, 0.15, 0.15])
    src_pick = rng.integers(0, len(SOURCES), n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        lang = langs[lang_pick[i]]
        src = SOURCES[src_pick[i]]
        r = rng.random()
        if i > 20 and r < 0.05:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        stop = LANG_STOP[lang]
        n_sent = int(rng.integers(3, 15))
        sents = []
        if rng.random() < 0.3:
            sents.append(BOILER[src])
        for _ in range(n_sent):
            n_w = int(rng.integers(6, 14))
            words = []
            for _w in range(n_w):
                if rng.random() < 0.45:
                    words.append(stop[rng.integers(0, len(stop))])
                else:
                    words.append(CONTENT[rng.integers(0, len(CONTENT))])
            sents.append(" ".join(words))
        if rng.random() < 0.08:  # PII for the redaction operators
            sents.append(
                f"contact user{int(rng.integers(1, 999))}@example.com or "
                f"call 555-123-4567 from 10.0.{int(rng.integers(0, 255))}."
                f"{int(rng.integers(1, 255))}"
            )
        text = ". ".join(sents) + "."
        if i > 20 and r < 0.10:  # near-duplicate: copy + small edit
            base = texts[rng.integers(0, i)]
            w = base.split(" ")
            for _e in range(min(3, max(1, len(w) // 40))):
                w[rng.integers(0, len(w))] = CONTENT[rng.integers(0, len(CONTENT))]
            text = " ".join(w)
        texts.append(text)
    # deterministic duplicate structure so dedup gates/tests find pairs at
    # EVERY sf (the random 5%/10% draws above can miss at 50-doc scale)
    for i in range(20, n_doc):
        if i % 20 == 5:
            texts[i] = texts[i - 5]  # exact duplicate
        elif i % 20 == 11:  # near-duplicate: ~1 edit per 40 words
            w = texts[i - 11].split(" ")
            for j in range(0, len(w), 40):
                w[min(len(w) - 1, j + int(rng.integers(0, 40)))] = CONTENT[
                    rng.integers(0, len(CONTENT))
                ]
            texts[i] = " ".join(w)
    _write(
        os.path.join(out, "documents.parquet"),
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([langs[j] for j in lang_pick]),
                "source": pa.array([SOURCES[j] for j in src_pick]),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), pa.int64()
                ),
            }
        ),
    )

    # embeddings -------------------------------------------------------------
    dim, n_lab = 64, 10
    centers = rng.normal(size=(n_lab, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, n_lab, n_vec)
    vecs = centers[label] + rng.normal(scale=0.13, size=(n_vec, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    _write(
        os.path.join(out, "embeddings.parquet"),
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vec), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(label, pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    sfs = [float(a) for a in sys.argv[1:]] or [0.001, 0.01, 0.1]
    for sf in sfs:
        print(f"sf{sf:g}:")
        gen_sf(sf)
