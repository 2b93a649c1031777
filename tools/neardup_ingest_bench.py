"""Honesty harness for incremental_neardup: how much of the corpus's
near-dup mass does BATCHED ingest-time greedy dedup catch, versus the
offline ground truth (dedup_clusters over the full lsh_pairs graph)?

Protocol: split the documents table into B equal doc_id-range batches,
ingest them in order through the band ledger (write_seen_ledger /
incremental_neardup_against_band_ledger, mode="append" after each
accepted batch — the exact deployment loop), then compare:

- offline_kept: dedup_clusters canonical survivors (one per connected
  near-dup component, the offline/audit decision)
- ingest_kept:  what the batched greedy loop admitted

Reported:
- dup_caught: fraction of offline-identified duplicate docs (non-
  canonical cluster members) the ingest loop ALSO rejected — the recall
  of ingest-time dedup against the offline decision
- over_drop: docs the ingest loop rejected that offline keeps — the
  greedy/banding cost (chain non-transitivity + band-collision
  aggression); these are docs a deployment loses relative to a full
  offline pass
- per-batch wall times, to show the constant-batch-cost claim on a
  GROWING band ledger

Usage: python tools/neardup_ingest_bench.py [sf_dir] [n_batches]
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
from baker_spark.datapipe import dedup  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("neardup_ingest_bench")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    n_docs = docs.count()
    span = (hi - lo + 1 + n_batches - 1) // n_batches

    # offline ground truth: canonical survivors of the near-dup graph
    clustered = dedup.dedup_clusters(docs, dedup.lsh_pairs(docs))
    offline_kept = {
        r["doc_id"] for r in clustered.filter("is_canonical").collect()
    }
    offline_dropped = set(
        r["doc_id"] for r in clustered.filter("NOT is_canonical").collect()
    )

    table = "neardup_ingest_bench_ledger"
    path = tempfile.mkdtemp(prefix="neardup_ledger_")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ingest_kept: set[int] = set()
    batch_walls = []
    try:
        for b in range(n_batches):
            batch = docs.filter(
                (F.col("doc_id") >= lo + b * span) & (F.col("doc_id") < lo + (b + 1) * span)
            )
            t0 = time.perf_counter()
            if b == 0:
                # first batch: empty ledger — two-corpora form vs nothing
                kept_ids = dedup.incremental_neardup(
                    batch, batch.limit(0)
                )
                kept_keys = dedup.band_ledger_keys(
                    dedup.lsh_bands(batch).join(
                        kept_ids, "doc_id", "left_semi"
                    )
                )
                dedup.write_seen_ledger(
                    kept_keys, table, path=path, mode="overwrite"
                )
                ids = {r["doc_id"] for r in kept_ids.collect()}
            else:
                kept_ids, kept_keys = dedup.incremental_neardup_against_band_ledger(
                    batch, spark, table
                )
                ids = {r["doc_id"] for r in kept_ids.collect()}
                dedup.write_seen_ledger(kept_keys, table, path=path, mode="append")
            batch_walls.append(round(time.perf_counter() - t0, 2))
            ingest_kept |= ids

        ingest_dropped = (
            {r["doc_id"] for r in docs.select("doc_id").collect()} - ingest_kept
        )
        caught = len(offline_dropped & ingest_dropped)
        over = len(ingest_dropped - offline_dropped)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "n_batches": n_batches,
                    "offline_kept": len(offline_kept),
                    "offline_dropped": len(offline_dropped),
                    "ingest_kept": len(ingest_kept),
                    "dup_caught": caught,
                    "dup_caught_frac": round(caught / max(1, len(offline_dropped)), 4),
                    "over_drop": over,
                    "over_drop_frac_of_corpus": round(over / n_docs, 4),
                    "batch_walls_s": batch_walls,
                }
            )
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(path, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
