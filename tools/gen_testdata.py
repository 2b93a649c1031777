"""Deterministic synthetic testdata generator — the same star schema,
value domains, and key relationships as the driver's sf0.001/0.01/0.1
dirs (TESTDATA.md), profiled from /root/testdata/sf0.1, so the repo can
extend the scaling sweep one decade past what the driver ships
(SCALING.md's sf1 rows come from this).

    python tools/gen_testdata.py 1 testdata/sf1

Everything is numpy seeded with 42 + the scale factor — regenerating is
cheap and exact, so the parquet itself stays out of git (.gitignore).

Schema/distribution fidelity (measured against the driver's sf0.1):
- row counts scale linearly: lineitem 6M/sf, orders 1.5M/sf, events
  1M/sf, documents 50k/sf, embeddings 20k/sf, customer 150k/sf,
  part 200k/sf, supplier 10k/sf; nation/region fixed
- documents: 10-100 words from the driver's 30-word vocabulary, 41% en
  + {de,zh,fr,es}, 20 sources, ~5% near-dups (one word swapped for
  'dup') and ~0.16% exact dups — the structure minhash/jaccard/simhash
  queries prune against
- embeddings: unit-norm 64-dim float32 (coord std 1/8), labels 0-9
- events: exponential inter-arrival over the same 30-day Jan-2024
  window (densifies with sf, like a real stream), value ~ Exp(50),
  props = {"k": 0..99}
- timestamps written as timestamp[us], matching the driver's files
- row groups: 128k rows so a 32-thread local scan parallelizes (the
  driver's own sf0.1 lineitem has 3 row groups — a measured scan floor)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["large", "hot", "blue", "old", "cold", "red", "new", "dark"]
NOUNS = ["ring", "bolt", "plate", "gear", "cap", "tube", "disk", "rod"]
DIM = 64
ROW_GROUP = 128 * 1024


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"), row_group_size=ROW_GROUP)
    print(f"  {name}: {table.num_rows} rows")


def _us(days_float: np.ndarray, epoch: str) -> pa.Array:
    base = np.datetime64(epoch, "us")
    return pa.array(base + (days_float * 86_400_000_000).astype("timedelta64[us]"))


def generate(sf: float, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(int(42 + sf * 1000))

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)
    n_user = int(15_000 * sf)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    ck = np.arange(n_cust, dtype=np.int64)
    _write(outdir, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    sk = np.arange(n_supp, dtype=np.int64)
    _write(outdir, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part, dtype=np.int64)
    names = np.char.add(
        np.char.add(np.array(ADJS)[rng.integers(0, 8, n_part)], " "),
        np.array(NOUNS)[rng.integers(0, 8, n_part)],
    )
    _write(outdir, "part", pa.table({
        "p_partkey": pk,
        "p_name": names,
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[rng.integers(0, 25, n_part)],
        "p_type": np.array(P_TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 20000) * 0.1, 2),
    }))

    ok = np.arange(n_ord, dtype=np.int64)
    odays = rng.uniform(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    _write(outdir, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _us(np.floor(odays), "1995-01-01"),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: 1 + Poisson(3) lines per order (measured mean 4.0, min 1)
    nlines = 1 + rng.poisson(3.0, n_ord)
    lok = np.repeat(ok, nlines)
    n_li = len(lok)
    # per-order line numbers: arange within each repeat block
    ln = np.arange(n_li) - np.repeat(np.concatenate(([0], np.cumsum(nlines)[:-1])), nlines) + 1
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _us(np.floor(np.repeat(odays, nlines) + rng.uniform(1, 95, n_li)), "1995-01-01"),
    }))

    # events: exponential inter-arrival across a fixed 30-day window —
    # the stream densifies with sf instead of stretching
    gaps = rng.exponential(1.0, n_ev)
    ts_days = np.cumsum(gaps) / np.sum(gaps) * 29.9986
    _write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _us(ts_days, "2024-01-01"),
        "user_id": rng.integers(0, n_user, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10-100 vocab words; ~5% near-dups (one word -> 'dup'),
    # ~0.16% exact dups of an earlier doc
    lens = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.0016:
            texts.append(texts[rng.integers(0, i)])
            continue
        words = [VOCAB[w] for w in rng.integers(0, len(VOCAB), lens[i])]
        if i > 10 and r < 0.05 + 0.0016:
            src = texts[rng.integers(0, i)].split(" ")
            src[rng.integers(0, len(src))] = "dup"
            texts.append(" ".join(src))
            continue
        texts.append(" ".join(words))
    _write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{s}" for s in range(20)])[rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    vecs = rng.normal(0, 1, (n_vec, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"testdata/sf{sf:g}"
    print(f"generating sf={sf} -> {out}")
    generate(sf, out)
