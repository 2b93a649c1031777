"""Runnable example: at-least-once ingestion with a persistent
fingerprint ledger — the production shape of incremental dedup.

    python examples/incremental_ingest.py [sf_dir]

The corpus arrives in batches (possibly redelivered — SQS/Kinesis are
at-least-once transports, SURVEY.md §2.1). Each batch is deduped
in-batch AND against everything already ingested:

1. bootstrap the ledger from the first batch's fingerprints
   (dedup.write_seen_ledger: parquet table BUCKETED by fp — the layout
   that keeps per-batch cost flat as the ledger grows; see
   tools/ledger_bench.py for the measured curve)
2. for each later batch: incremental_dedup_against_ledger — a hash
   anti-join whose only shuffle is the small new batch
3. append the accepted batch's keys (write_seen_ledger mode="append")

Batch 2 deliberately overlaps batch 1 (redelivery) to show the ledger
rejecting already-ingested documents.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from baker_spark.datapipe import dedup, text  # noqa: E402
from baker_spark.session import get_spark  # noqa: E402
from baker_spark.sources.tables import load_table  # noqa: E402

LEDGER_TABLE = "ingest_ledger_example"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental_ingest_example", cpus=4)
    docs = load_table(spark, sf_dir, "documents")
    key = text.fingerprint("text")
    ledger_path = os.path.abspath("_out/ingest_ledger")

    # batch 1 bootstraps; batches 2-3 overlap it (simulated redelivery)
    batches = [
        docs.filter(F.col("doc_id") < 200),
        docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 300)),
        docs.filter(F.col("doc_id") >= 250),
    ]

    spark.sql(f"DROP TABLE IF EXISTS {LEDGER_TABLE}")
    accepted0 = (
        batches[0]
        .groupBy(key.alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
    )
    dedup.write_seen_ledger(accepted0.select("fp"), LEDGER_TABLE, path=ledger_path)
    print(f"batch 0: accepted {accepted0.count()} docs (bootstrap)")

    for i, batch in enumerate(batches[1:], start=1):
        accepted = dedup.incremental_dedup_against_ledger(
            batch, spark, LEDGER_TABLE, key
        )
        n = accepted.count()
        dedup.write_seen_ledger(
            accepted.select("fp"), LEDGER_TABLE, path=ledger_path, mode="append"
        )
        print(f"batch {i}: accepted {n} new docs, redelivered/dup rest dropped")

    total = spark.table(LEDGER_TABLE).count()
    distinct_all = docs.select(key.alias("fp")).distinct().count()
    print(f"ledger holds {total} keys; corpus has {distinct_all} distinct fingerprints")
    spark.sql(f"DROP TABLE IF EXISTS {LEDGER_TABLE}")

    # ---- the NEAR-dup tier (round 11) over the same batches -------------
    # The fingerprint ledger only stops byte-level redelivery; a crawl
    # refresh mostly redelivers boilerplate-shifted VARIANTS. The band
    # ledger applies lsh_pairs' jaccard-threshold rule at ingest time,
    # through the same bucketed write_seen_ledger machinery (fp='band:h').
    nd_table, nd_path = "ingest_band_ledger_example", os.path.abspath("_out/band_ledger")
    spark.sql(f"DROP TABLE IF EXISTS {nd_table}")
    kept0 = dedup.incremental_neardup(batches[0], batches[0].limit(0))
    keys0 = dedup.band_ledger_keys(
        dedup.lsh_bands(batches[0]).join(kept0, "doc_id", "left_semi")
    )
    dedup.write_seen_ledger(keys0, nd_table, path=nd_path)
    print(f"near-dup batch 0: admitted {kept0.count()} docs (bootstrap)")
    for i, batch in enumerate(batches[1:], start=1):
        kept_ids, kept_keys = dedup.incremental_neardup_against_band_ledger(
            batch, spark, nd_table
        )
        n = kept_ids.count()
        dedup.write_seen_ledger(kept_keys, nd_table, path=nd_path, mode="append")
        print(f"near-dup batch {i}: admitted {n} docs (redelivered AND near-dup variants dropped)")
    spark.sql(f"DROP TABLE IF EXISTS {nd_table}")


if __name__ == "__main__":
    main()
