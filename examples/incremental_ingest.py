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


if __name__ == "__main__":
    main()
