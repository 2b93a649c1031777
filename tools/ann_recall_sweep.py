"""Recall@k-vs-cost sweep over the ann_search facade's methods, so a
user can pick a method from measured numbers instead of folklore.

For a sample of query ids: exact brute-force top-k is the ground truth;
each method's top-k is scored as recall@k = |hits| / k; cost is the
measured wall time per query plus each method's analytic scan fraction
(what it reads per query relative to a full scan, the number that
actually matters at 10^9 vectors — local wall time at 20k vectors is
dominated by Spark overheads, not the scan).

    python tools/ann_recall_sweep.py [sf_dir] [n_queries] [k]

Output: one markdown table (for PERFORMANCE.md) + a JSON line.

Honest caveat baked into the output: the driver's synthetic embeddings
are isotropic gaussian, so bucketed methods' recall here is a FLOOR —
real (clustered) embeddings concentrate neighbors into cells and raise
it; the scan fractions are geometry-free and transfer as-is. See
dp_ann_recall's docstring for the long form.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from baker_spark.datapipe import vectors  # noqa: E402
from baker_spark.sources.tables import load_table  # noqa: E402

METHODS = ["brute", "lsh", "lsh_mp", "ivf", "pq", "ivfpq"]


def main() -> int:
    from baker_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("ann-recall-sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))

    emb = load_table(spark, sf_dir, "embeddings").persist()
    n_corpus = emb.count()
    qids = [int(r.vec_id) for r in emb.select("vec_id").orderBy("vec_id").limit(n_q).collect()]

    # analytic scan fraction per query (the 10^9-vector cost axis)
    n_buckets = 2 ** vectors.N_PLANES
    frac = {
        "brute": 1.0,
        "lsh": 1.0 / n_buckets,
        # multi-probe: own bucket + N_PLANES Hamming-1 neighbors
        "lsh_mp": (1.0 + vectors.N_PLANES) / n_buckets,
        # IVF scans full-precision vectors of nprobe/kc cells
        "ivf": 2.0 / 8.0,
        # PQ ADC reads every CODE (8 bytes/vec vs 256-byte raw vectors)
        "pq": 8.0 / (4.0 * vectors.EMBED_DIM),
        # IVF-PQ: nprobe/kc of the codes (defaults nprobe=2, kc=8)
        "ivfpq": (2.0 / 8.0) * 8.0 / (4.0 * vectors.EMBED_DIM),
    }

    # recall excludes the query point itself: every method returns the
    # query as its own top hit (max self-cosine / zero self-ADC), which
    # would gift +1/k recall to ANY method — even one returning the
    # query plus random ids. Fetch k+1 and score the k true NEIGHBORS.
    truth: dict[int, set] = {}
    rows_out = []
    for method in METHODS:
        hits = 0
        t0 = time.perf_counter()
        for qid in qids:
            kw = {"max_rows": None} if method == "brute" else {}
            ordered = [
                r[0]
                for r in vectors.ann_search(
                    emb, query_id=qid, k=k + 1, method=method, **kw
                ).collect()
            ]  # rank order preserved; drop self, keep the k best neighbors
            neigh = [x for x in ordered if x != qid][:k]
            if method == "brute":
                truth[qid] = set(neigh)
                hits += len(neigh)
            else:
                hits += len(set(neigh) & truth[qid])
        dt = time.perf_counter() - t0
        rows_out.append(
            {
                "method": method,
                "recall_at_k": round(hits / (k * len(qids)), 3),
                "sec_per_query_local": round(dt / len(qids), 2),
                "scan_fraction_per_query": frac[method],
            }
        )

    print(f"\nANN recall@{k} vs cost — {sf_dir} ({n_corpus} vectors, {len(qids)} queries)\n")
    print("| method | recall@%d | s/query (local) | scan fraction/query |" % k)
    print("|---|---|---|---|")
    for r in rows_out:
        print(
            f"| {r['method']} | {r['recall_at_k']:.2f} | "
            f"{r['sec_per_query_local']} | {r['scan_fraction_per_query']:.4g} |"
        )
    print()
    print(json.dumps({"sf_dir": sf_dir, "k": k, "n_queries": len(qids), "rows": rows_out}))
    emb.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
