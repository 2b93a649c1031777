"""Runnable example: the LLM training-corpus pipeline end to end.

    python examples/corpus_pipeline.py [sf_dir]

Stages (each also available as an individual query in
``__spark_entry__.queries()`` with a DuckDB oracle):

1. scrub PII/noise        (datapipe.text.scrub)
2. quality gate           (datapipe.text.quality_flags)
3. near-dup clustering    (minhash-LSH pairs -> connected components)
4. keep canonical docs    (is_canonical)
5. chunk into samples     (datapipe.text.chunks)

Writes the kept, chunked corpus as parquet and prints stage counts.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from baker_spark.datapipe import dedup, text  # noqa: E402
from baker_spark.session import get_spark  # noqa: E402
from baker_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_out"
    spark = get_spark("corpus_pipeline")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # auto engine pick: JVM chain at small inputs, Arrow/RE2 past the
    # measured crossover (text.SCRUB_ARROW_MIN_INPUT_BYTES)
    cleaned = text.scrubbed(docs, "text").select("doc_id", "clean_text")
    flagged = cleaned.filter(text.quality_flags("clean_text")["quality_ok"])
    n1 = flagged.count()

    clusters = dedup.dedup_clusters(flagged, dedup.lsh_pairs(flagged, text_col="clean_text"))
    kept = flagged.join(
        clusters.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
    )
    n2 = kept.count()

    chunked = kept.select(
        "doc_id", F.posexplode(text.chunks("clean_text")).alias("chunk_idx", "chunk")
    )
    chunked.write.mode("overwrite").parquet(out)
    # count the WRITTEN parquet: counting `chunked` would re-run the whole
    # scrub -> quality -> LSH -> clustering lineage a second time
    n3 = spark.read.parquet(out).count()

    print(
        f"documents={n0} quality_kept={n1} after_dedup={n2} "
        f"training_chunks={n3} -> {out}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
