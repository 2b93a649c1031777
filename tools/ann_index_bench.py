"""Persistent-ANN-index lifecycle measurement: build cost vs per-query
search cost across scale decades.

The claim under test (VERDICT r9 #1, SCALING.md discipline): with the
IVF-PQ index built ONCE and persisted partitioned by centroid_id,
per-query search cost stays ~flat while the corpus grows a decade,
because the probe scans only nprobe/kc of the CODES (8 bytes/vector),
never the vectors — versus the inline ivfpq_topk whose every call pays
the full training + encode scan.

    python tools/ann_index_bench.py [sf ...]   (default: 0.01 0.1 1)

Output: one markdown table (for SCALING.md) + a JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from baker_spark.datapipe import ann_index, vectors  # noqa: E402
from baker_spark.session import get_spark  # noqa: E402
from baker_spark.sources.tables import load_table  # noqa: E402

KC, NPROBE, K, N_QUERIES = 8, 2, 10, 5


def sf_dir(sf: float) -> str:
    name = f"sf{sf:g}"
    for root in ("/root/testdata", os.path.join(REPO, "testdata")):
        p = os.path.join(root, name)
        if os.path.exists(os.path.join(p, "embeddings.parquet")):
            return p
    raise SystemExit(f"no embeddings.parquet for {name} (see tools/gen_testdata.py)")


def main() -> int:
    sfs = [float(x) for x in sys.argv[1:]] or [0.01, 0.1, 1.0]
    spark = get_spark("ann_index_bench")
    rows = []
    for sf in sfs:
        d = sf_dir(sf)
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        qvecs = {
            r["vec_id"]: list(r["qv"])
            for r in emb.filter(emb.vec_id < N_QUERIES)
            .select("vec_id", vectors.as_double("embedding").alias("qv"))
            .collect()
        }
        path = os.path.join(
            tempfile.gettempdir(),
            "baker_ann_index_bench",
            hashlib.md5(d.encode()).hexdigest(),
        )
        shutil.rmtree(path, ignore_errors=True)

        t0 = time.monotonic()
        ann_index.ann_index_build(emb, path, method="ivfpq", kc=KC, iters=1, key=d)
        build_s = time.monotonic() - t0

        # the search-many shape: open ONCE (side tables cached on the
        # driver), then per-query cost is just the pruned scan. Warm one
        # search (JVM/readers) before timing the batch.
        idx = ann_index.AnnIndex(spark, path)
        idx.search(qvecs[0], k=K, nprobe=NPROBE)[0].collect()
        t0 = time.monotonic()
        for qid in sorted(qvecs):
            idx.search(qvecs[qid], k=K, nprobe=NPROBE)[0].collect()
        search_s = (time.monotonic() - t0) / len(qvecs)

        # the inline comparator: training + encode + search every call
        t0 = time.monotonic()
        vectors.ivfpq_topk(emb, query_id=0, k=K, kc=KC, nprobe=NPROBE, iters=1).collect()
        inline_s = time.monotonic() - t0

        rows.append(
            {
                "sf": sf,
                "n_vectors": n,
                "build_s": round(build_s, 3),
                "search_s_per_query": round(search_s, 4),
                "inline_s_per_query": round(inline_s, 3),
            }
        )
        print(f"-- sf{sf:g}: {rows[-1]}", file=sys.stderr)

    print("| sf | vectors | index build (s) | indexed search (s/query) | inline train+search (s/query) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['sf']:g} | {r['n_vectors']} | {r['build_s']} | "
            f"{r['search_s_per_query']} | {r['inline_s_per_query']} |"
        )
    print(json.dumps({"metric": "ann_index_lifecycle", "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
