"""Runnable example: the persistent ANN index lifecycle — build once,
search many, ingest incrementally.

    python examples/ann_lifecycle.py [sf_dir]

The deployment shape of similarity search at 100 TB (the reference's
ExternalMatch build-once/probe-many pattern applied to vectors,
SCALING.md round-10 addendum):

1. `ann_index_build` trains the IVF-PQ quantizers ONCE over the corpus
   and persists the 8-byte-per-subspace codes PARTITIONED BY coarse
   cell (any Hadoop-compatible path — local here, s3a:// in prod)
2. `AnnIndex(spark, path)` opens the index: the kc coarse centroids and
   the PQ codebook (a few KB) load to the driver once
3. each `idx.search(query_vec)` plans ONLY the probed cells' code files
   (partition pruning) — no training job, no corpus scan, per-query
   cost independent of corpus size
4. a new batch lands: `ann_index_add` encodes it against the FROZEN
   quantizers (exact int64, O(batch)) and appends — the next search
   sees the new vectors through the same pruning
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baker_spark.datapipe import ann_index, vectors  # noqa: E402
from baker_spark.session import get_spark  # noqa: E402
from baker_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ann_lifecycle_example", cpus=4)
    emb = load_table(spark, sf_dir, "embeddings")

    initial = emb.filter(emb.vec_id % 2 == 0)  # today's corpus
    batch = emb.filter(emb.vec_id % 2 == 1)  # tomorrow's arrivals

    path = os.path.join(tempfile.mkdtemp(prefix="ann_example_"), "idx")
    meta = ann_index.ann_index_build(initial, path, method="ivfpq", kc=8, iters=1)
    print(f"built {meta['method']} index at {path}")

    idx = ann_index.AnnIndex(spark, path)  # open once, search many
    qv = emb.filter(emb.vec_id == 2).select(
        vectors.as_double("embedding").alias("v")
    ).first()["v"]
    out, score_col, _ = idx.search(qv, k=5, nprobe=2)
    print(f"top-5 before ingest ({score_col} ascending):")
    out.show()

    ann_index.ann_index_add(batch, path)  # frozen quantizers, O(batch)
    out2, _, _ = idx.search(qv, k=5, nprobe=2)
    print("top-5 after ingesting the odd-id batch (new candidates visible):")
    out2.show()

    # the facade view: uniform (id, rank, score, method) like any other
    # ann_search call
    vectors.ann_search(emb, query_id=2, k=5, index=idx).show()


if __name__ == "__main__":
    main()
