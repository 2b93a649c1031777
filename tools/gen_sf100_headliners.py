"""sf100 lineitem for the two headliners (q1_pricing_summary and
bench.py's baker_filter_chain — both read ONLY lineitem): 600M rows,
~20 GB parquet, generated in sf10-sized chunks so peak memory stays
~1/10th of a monolithic build (gen_testdata.py builds each table in one
numpy shot, which at sf100 would need >100 GB of transient arrays).

Chunks land as part files inside a ``lineitem.parquet`` DIRECTORY —
spark.read.parquet and DuckDB's read_parquet('.../lineitem.parquet/*')
both treat it exactly like the driver's single-file layout. Same value
domains and per-order line structure as tools/gen_testdata.py
(1 + Poisson(3) lines/order, shipdate = orderdate + U[1,95] days);
deterministic per-chunk seeds, so regeneration is exact.

    python tools/gen_sf100_headliners.py [out_dir] [n_chunks]

Default out: testdata/sf100 (gitignored like sf1/sf10).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP = 128 * 1024
SF = 100.0
N_ORD_TOTAL = int(1_500_000 * SF)
N_PART = int(200_000 * SF)
N_SUPP = int(10_000 * SF)


def gen_chunk(out_dir: str, chunk: int, n_chunks: int) -> int:
    rng = np.random.default_rng(int(42 + SF * 1000) + chunk)
    lo = chunk * (N_ORD_TOTAL // n_chunks)
    hi = (chunk + 1) * (N_ORD_TOTAL // n_chunks) if chunk < n_chunks - 1 else N_ORD_TOTAL
    n_ord = hi - lo
    ok = np.arange(lo, hi, dtype=np.int64)
    odays = rng.uniform(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01

    nlines = 1 + rng.poisson(3.0, n_ord)
    lok = np.repeat(ok, nlines)
    n_li = len(lok)
    ln = (
        np.arange(n_li)
        - np.repeat(np.concatenate(([0], np.cumsum(nlines)[:-1])), nlines)
        + 1
    )
    table = pa.table(
        {
            "l_orderkey": lok,
            "l_partkey": rng.integers(0, N_PART, n_li),
            "l_suppkey": rng.integers(0, N_SUPP, n_li),
            "l_linenumber": pa.array(ln, pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
            "l_shipdate": _us(
                np.floor(np.repeat(odays, nlines) + rng.uniform(1, 95, n_li)),
                "1995-01-01",
            ),
        }
    )
    li_dir = os.path.join(out_dir, "lineitem.parquet")
    os.makedirs(li_dir, exist_ok=True)
    pq.write_table(
        table,
        os.path.join(li_dir, f"part-{chunk:04d}.parquet"),
        row_group_size=ROW_GROUP,
    )
    return n_li


# value domains come from THE generator the lower decades used — a
# hand-copied vocab/dup-rate here would silently diverge the sf100
# distribution from sf0.001-sf10 and invalidate every cross-decade
# exponent in SCALING.md
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_testdata import _us, LANG_P, LANGS, VOCAB  # noqa: E402

N_DOC_TOTAL = int(50_000 * SF)


def gen_documents_chunk(out_dir: str, chunk: int, n_chunks: int) -> int:
    """Same text structure as gen_testdata.py's documents (10-100 vocab
    words, ~5% near-dups, ~0.16% exact dups) — dup back-references stay
    within the chunk, which preserves the dup RATE the dedup family
    prunes against (the queries never depend on which doc is the
    source)."""
    rng = np.random.default_rng(int(7 + SF * 1000) + chunk)
    lo = chunk * (N_DOC_TOTAL // n_chunks)
    hi = (chunk + 1) * (N_DOC_TOTAL // n_chunks) if chunk < n_chunks - 1 else N_DOC_TOTAL
    n = hi - lo
    lens = rng.integers(10, 101, n)
    rands = rng.random(n)
    texts: list[str] = []
    for i in range(n):
        r = rands[i]
        if i > 10 and r < 0.0016:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        words = [VOCAB[w] for w in rng.integers(0, len(VOCAB), lens[i])]
        if i > 10 and r < 0.05 + 0.0016:
            src = texts[int(rng.integers(0, i))].split(" ")
            src[int(rng.integers(0, len(src)))] = "dup"
            texts.append(" ".join(src))
            continue
        texts.append(" ".join(words))
    doc_dir = os.path.join(out_dir, "documents.parquet")
    os.makedirs(doc_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(lo, hi, dtype=np.int64),
                "text": texts,
                "lang": np.array(LANGS)[rng.choice(5, n, p=LANG_P)],
                "source": np.array([f"src{s}" for s in range(20)])[
                    rng.integers(0, 20, n)
                ],
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        os.path.join(doc_dir, f"part-{chunk:04d}.parquet"),
        row_group_size=ROW_GROUP,
    )
    return n


N_VEC_TOTAL = int(20_000 * SF)
EMBED_DIM = 64


def gen_embeddings_chunk(out_dir: str, chunk: int, n_chunks: int) -> int:
    """Unit-norm 64-dim float32, same distribution as gen_testdata.py."""
    rng = np.random.default_rng(int(11 + SF * 1000) + chunk)
    lo = chunk * (N_VEC_TOTAL // n_chunks)
    hi = (chunk + 1) * (N_VEC_TOTAL // n_chunks) if chunk < n_chunks - 1 else N_VEC_TOTAL
    n = hi - lo
    vecs = rng.normal(0, 1, (n, EMBED_DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vec_dir = os.path.join(out_dir, "embeddings.parquet")
    os.makedirs(vec_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(lo, hi, dtype=np.int64),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(rng.integers(0, 10, n), pa.int32()),
            }
        ),
        os.path.join(vec_dir, f"part-{chunk:04d}.parquet"),
        row_group_size=ROW_GROUP,
    )
    return n


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "testdata/sf100"
    n_chunks = int(args[1]) if len(args) > 1 else 10
    if "--embeddings" in sys.argv:
        vec_dir = os.path.join(out, "embeddings.parquet")
        if os.path.isdir(vec_dir):
            import shutil

            shutil.rmtree(vec_dir)
        total = 0
        for c in range(n_chunks):
            total += gen_embeddings_chunk(out, c, n_chunks)
            print(f"  embeddings chunk {c + 1}/{n_chunks} (total {total})", flush=True)
        print(f"sf100 embeddings: {total} rows -> {vec_dir}/")
        return 0
    if "--documents" in sys.argv:
        doc_dir = os.path.join(out, "documents.parquet")
        if os.path.isdir(doc_dir):
            import shutil

            shutil.rmtree(doc_dir)
        total = 0
        for c in range(n_chunks):
            total += gen_documents_chunk(out, c, n_chunks)
            print(f"  documents chunk {c + 1}/{n_chunks} (total {total})", flush=True)
        print(f"sf100 documents: {total} rows -> {doc_dir}/")
        return 0
    # clear any previous layout: a rerun with a DIFFERENT n_chunks would
    # otherwise leave stale part files beyond the new range and silently
    # inflate the dataset with duplicated orderkeys
    li_dir = os.path.join(out, "lineitem.parquet")
    if os.path.isdir(li_dir):
        import shutil

        shutil.rmtree(li_dir)
    total = 0
    for c in range(n_chunks):
        n = gen_chunk(out, c, n_chunks)
        total += n
        print(f"  chunk {c + 1}/{n_chunks}: {n} rows (total {total})", flush=True)
    print(f"sf100 lineitem: {total} rows -> {out}/lineitem.parquet/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
