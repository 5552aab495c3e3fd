#!/usr/bin/env python
"""Generate a statistically-equivalent copy of the driver's synthetic bench
tables at an arbitrary scale factor (measurement aid only).

Round 6 context: the driver's round-5 MEASUREMENT escalated to sf=1.0 with a
driver-generated directory that is not kept between sessions. /root/testdata
is read-only and holds only sf{0.001,0.01,0.1}. This script re-creates the
same schema/distributions (inferred from the sf0.1 tables: row-count ratios,
value ranges, the 30-word document vocabulary, the ~5%% near-copy documents
with a " dup" marker, single-file parquet with default row groups so scan
parallelism matches the driver layout) at any sf, so optimization work can be
measured at the driver's scale. Correctness is NEVER gated on this data —
oracle parity runs against the read-only driver SFs.

Usage: python tools/gen_bench_data.py --sf 1.0 --out /root/bench_data/sf1.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
MKT = ["HOUSEHOLD", "BUILDING", "MACHINERY", "AUTOMOBILE", "FURNITURE"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["signup", "purchase", "view", "click", "error"]
PT_ADJ = ["large", "hot", "small", "cold", "bright", "dim", "smooth", "rough"]
PT_NOUN = ["ring", "bolt", "screw", "washer", "gear", "cog", "pin", "plate"]
PT_TYPE = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO", "MEDIUM"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen(sf: float, out_dir: str, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_users = max(int(15_000 * sf), 1)

    # region / nation (fixed)
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))

    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PT_ADJ[i % len(PT_ADJ)]} {PT_NOUN[(i // 7) % len(PT_NOUN)]}"
            for i in range(n_part)
        ],
        "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
        "p_type": [PT_TYPE[i % len(PT_TYPE)] for i in range(n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9_999, n_cust), 2),
        "c_mktsegment": [MKT[i] for i in rng.integers(0, 5, n_cust)],
    }))

    # orders + lineitem (shipdate correlated with orderdate, TPC-H style)
    day = np.timedelta64(86_400_000_000, "us")
    odate_lo = np.datetime64("1995-01-01T00:00:00", "us")
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(
        "timedelta64[D]"
    ).astype(int)
    odays = rng.integers(0, span_days + 1, n_ord)
    odate = odate_lo + odays * day
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [("O", "P", "F")[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1_000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": [PRIO[i] for i in rng.integers(0, 5, n_ord)],
    }))

    lkey = rng.integers(0, n_ord, n_li)
    sdate = odate[lkey] + rng.integers(1, 96, n_li) * day
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [("N", "A", "R")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    # events: ts sorted over 30 days of 2024-01
    ev_lo = np.datetime64("2024-01-01T00:00:00", "us")
    ts = np.sort(rng.integers(0, 30 * 86_400_000_000, n_ev))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ev_lo + ts * np.timedelta64(1, "us"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 600, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10..100 tokens from the 30-word vocab; ~5% near-copies of a
    # random other doc, most with " dup" appended (the sf0.1 structure)
    n_tok = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(VOCAB[i] for i in rng.integers(0, len(VOCAB), k)) for k in n_tok
    ]
    n_copies = int(0.05 * n_doc)
    copy_pos = rng.choice(n_doc, n_copies, replace=False)
    copy_src = rng.integers(0, n_doc, n_copies)
    mark = rng.random(n_copies) < 0.95
    for p, s, m in zip(copy_pos, copy_src, mark):
        if p == s:
            continue
        texts[p] = texts[s] + (" dup" if m else "")
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    out = args.out or f"/root/bench_data/sf{args.sf}"
    print(f"generating sf={args.sf} -> {out}")
    gen(args.sf, out, args.seed)


if __name__ == "__main__":
    main()
