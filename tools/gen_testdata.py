#!/usr/bin/env python
"""Generate driver-shaped synthetic testdata at an arbitrary scale factor.

The driver ships read-only parquet at sf0.001/0.01/0.1
(``/root/testdata``, see TESTDATA.md). The round-10 verdict's top ask is
an sf1 gate: AQE plan choices (broadcast<->SMJ flips, skew-join
activation) are size-dependent, so the full oracle registry must also be
green at a size where those flips actually happen. This generator
reproduces the driver tables' schemas, types (INTEGER vs BIGINT columns,
TIMESTAMP_MICROS, list<float32> embeddings) and value domains —
measured off sf0.1 — at any sf, deterministically (numpy PCG64, seeded).

It does NOT try to be byte-identical to the driver's generator (seed 42
internals unknown); the oracle gate compares Spark vs DuckDB on the SAME
files, so what matters is shape + domain fidelity: selectivities,
key densities, funnel orderings, dup structure, cluster structure.

Usage:
    python tools/gen_testdata.py --sf 1 --out testdata_local/sf1
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "SMALL", "STANDARD", "PROMO"]
PCOLORS = ["large", "hot", "blue", "red", "green", "dark", "light", "pale"]
PNOUNS = ["ring", "bolt", "disk", "tube", "cube", "wire", "gear", "plate"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]
VOCAB = ("batch part spark line column order small sort fast value scan a "
         "hash slow group agg filter query big key window row table stream "
         "merge data vector customer ship disk plan").split()


def _ts_us(days_from, rng, n, span_days, midnight=False):
    """Naive TIMESTAMP_MICROS values in [days_from, days_from+span)."""
    base = int(dt.datetime(*days_from).timestamp() * 1_000_000)
    if midnight:
        offs = rng.integers(0, span_days, n) * 86_400_000_000
    else:
        offs = rng.integers(0, span_days * 86_400_000_000, n)
    return pa.array(base + offs, type=pa.timestamp("us"))


def _write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    return table.num_rows


def generate(sf: float, out: str, seed: int = 42) -> dict:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    counts = {}

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_line = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = max(int(15_000 * sf), 10)

    counts["region"] = _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    counts["nation"] = _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    counts["customer"] = _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    counts["supplier"] = _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    counts["part"] = _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{PCOLORS[int(a)]} {PNOUNS[int(b)]}"
                   for a, b in zip(rng.integers(0, 8, n_part),
                                   rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 5, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    odate = _ts_us((1995, 1, 1), rng, n_ord, 2405, midnight=True)
    counts["orders"] = _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: l_orderkey references orders (~4 lines/order, 1..7 linenumber)
    lok = rng.integers(0, n_ord, n_line)
    lok.sort()
    # linenumber = rank within orderkey run (1-based, capped naturally)
    runs = np.concatenate([[0], np.cumsum(np.diff(lok) != 0)])
    _, first_idx = np.unique(runs, return_index=True)
    linenumber = (np.arange(n_line) - first_idx[runs] + 1).astype(np.int32)
    odate_np = odate.to_numpy(zero_copy_only=False)
    ship = (odate_np[lok].astype("datetime64[us]").astype(np.int64)
            + rng.integers(1, 96, n_line) * 86_400_000_000)
    counts["lineitem"] = _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_line), 2),
        "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_line)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_line)]),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    ev_ts = _ts_us((2024, 1, 1), rng, n_ev, 30)
    counts["events"] = _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": ev_ts,
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 31-word vocab, 10..100 tokens, ~0.2% exact dups + ~1%
    # near-dups (copy with a small token perturbation) for the dedup family
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    n_exact = max(n_doc // 500, 2)
    n_near = max(n_doc // 100, 2)
    for i in range(n_exact):
        texts[n_doc - 1 - i] = texts[int(rng.integers(0, n_doc // 2))]
    for i in range(n_near):
        src_toks = texts[int(rng.integers(0, n_doc // 2))].split()
        j = int(rng.integers(0, len(src_toks)))
        src_toks[j] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[n_doc - 1 - n_exact - i] = " ".join(src_toks)
    counts["documents"] = _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_doc, p=LANG_W)),
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 64-dim float32, 10 labels with weak cluster structure
    labels = rng.integers(0, 10, n_emb)
    centers = rng.uniform(-0.05, 0.05, (10, 64))
    vecs = (centers[labels] + rng.uniform(-0.35, 0.35, (n_emb, 64))).astype(np.float32)
    counts["embeddings"] = _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    counts = generate(args.sf, args.out, args.seed)
    print(json.dumps({"sf": args.sf, "out": args.out, "rows": counts}))


if __name__ == "__main__":
    main()
