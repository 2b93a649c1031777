"""Honesty harness for MediaIngest: how much of the corpus's image
near-dup mass does BATCHED ingest-time dedup catch, versus the offline
ground truth (dedup_clusters over the full banded_hamming_pairs graph)?
The image twin of neardup_ingest_bench.py.

Protocol: generate the image payloads (with_pixel_payload's PNG/GIF/
JPEG rows), split into B doc_id-range batches, run each through a
MediaIngest sink against one growing phash ledger — the exact
deployment loop, decode included — then compare:

- offline_kept: canonical survivors of the hamming<=3 pair graph
  (connected components, the offline/audit decision)
- ingest_kept:  what MediaIngest admitted

Reported: dup_caught (recall of ingest dedup vs the offline decision),
over_drop (docs ingest rejects that offline keeps — greedy chain
non-transitivity), per-batch walls on the GROWING ledger.

Usage: python tools/media_ingest_bench.py [sf_dir] [n_batches]
Prints one JSON line; SCALING.md quotes it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from baker_spark import get_spark  # noqa: E402
from baker_spark.datapipe import dedup, multimodal  # noqa: E402
from baker_spark.datapipe.ingest import MediaIngest  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("media_ingest_bench")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    packed = multimodal.with_pixel_payload(docs).select("doc_id", "payload")
    # image rows only (the %5 wav/text rows never enter either decision)
    imgs = packed.filter(F.col("doc_id") % 5 != 1).filter(F.col("doc_id") % 5 != 4)
    imgs = imgs.persist()
    n_imgs = imgs.count()

    # offline ground truth over the full corpus's hashes — band_cap=None:
    # the capped emitter UNDERCOUNTS edges exactly where classes are
    # dense (at sf1 the capped graph kept 22k of 30k images while the
    # uncapped truth keeps ~160 — comparing uncapped ingest to a capped
    # "truth" reported a bogus 73% over-drop), and ingest's verified
    # probe has no cap, so the audit graph must be the exhaustive one
    sigs = multimodal.media_phash(imgs).select("doc_id", "phash").persist()
    pairs = dedup.banded_hamming_pairs(sigs, "phash", band_cap=None)
    clustered = dedup.dedup_clusters(
        sigs.select("doc_id"), pairs.select("doc_a", "doc_b")
    )
    offline_dropped = {
        r["doc_id"] for r in clustered.filter("NOT is_canonical").collect()
    }
    offline_kept_n = n_imgs - len(offline_dropped)

    lo, hi = imgs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    span = (hi - lo + 1 + n_batches - 1) // n_batches
    root = tempfile.mkdtemp(prefix="media_ingest_bench_")
    table = "media_ingest_bench_ledger"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    sink = MediaIngest(
        corpus_dir=os.path.join(root, "corpus"),
        ledger_dir=os.path.join(root, "ledger"),
        ledger_table=table,
        ledger_buckets=16,
    )
    batch_walls = []
    try:
        for b in range(n_batches):
            batch = imgs.filter(
                (F.col("doc_id") >= lo + b * span)
                & (F.col("doc_id") < lo + (b + 1) * span)
            )
            t0 = time.perf_counter()
            sink.write(batch)
            batch_walls.append(round(time.perf_counter() - t0, 2))
        ingest_kept = {
            r["doc_id"]
            for r in spark.read.parquet(sink.corpus_dir).select("doc_id").collect()
        }
        # compare over DECODABLE ids only: a payload media_phash skips
        # (undecodable / over decode budget) is absent from the ground
        # truth's hash set AND from the corpus — counting it as an
        # ingest over-drop would charge the dedup rule for a decision
        # it never made (all fixture payloads decode, but the harness
        # must stay honest on corpora where some don't)
        decodable_ids = {r["doc_id"] for r in sigs.select("doc_id").collect()}
        ingest_dropped = decodable_ids - ingest_kept
        caught = len(offline_dropped & ingest_dropped)
        over = len(ingest_dropped - offline_dropped)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_images": n_imgs,
                    "n_batches": n_batches,
                    "offline_kept": offline_kept_n,
                    "offline_dropped": len(offline_dropped),
                    "ingest_kept": len(ingest_kept),
                    "dup_caught": caught,
                    "dup_caught_frac": round(caught / max(1, len(offline_dropped)), 4),
                    "over_drop": over,
                    "over_drop_frac_of_corpus": round(over / max(1, n_imgs), 4),
                    "batch_walls_s": batch_walls,
                }
            )
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(root, ignore_errors=True)
        sigs.unpersist()
        imgs.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
