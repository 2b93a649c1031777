"""Runnable example: continuous image ingestion with verified near-dup
dedup — the multimodal twin of incremental_ingest.py.

    python examples/media_ingest.py

Batches of binary image payloads arrive (at-least-once transports
redeliver); each batch pixel-decodes to 60-bit perceptual hashes, is
screened against a persistent phash band ledger with VERIFIED
collisions (a 15-bit band collides by chance at corpus scale — the
drop rule checks hamming <= 3 against the colliding hash), survivors
append to the corpus and their band keys to the fp-bucketed ledger.

Batch 2 deliberately redelivers one of batch 1's images byte-for-byte
and ships one brightness-shifted re-encode (aHash is shift-invariant,
so it hashes identically) plus one genuinely new image and one
undecodable blob — exercising every admission outcome in one run.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baker_spark.datapipe import multimodal as M  # noqa: E402
from baker_spark.datapipe.ingest import MediaIngest  # noqa: E402
from baker_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("media-ingest-example", cpus=4)
    root = tempfile.mkdtemp(prefix="media_ingest_")
    sink = MediaIngest(
        corpus_dir=os.path.join(root, "corpus"),
        ledger_dir=os.path.join(root, "ledger"),
        ledger_table="media_ingest_example_ledger",
        ledger_buckets=4,
    )

    # distinct dimensions on purpose: aHash is brightness-shift
    # invariant, so same-dim gradient images are hamming-0 duplicates
    img_a = M.png_pixel_bytes(9, 7, seed=1)
    img_b = M.gif_pixel_bytes(16, 5, seed=2)
    img_c = M.jpeg_pixel_bytes(16, 12, seed=3)
    img_new = M.png_pixel_bytes(5, 13, seed=9)
    shifted_a = M.png_pixel_bytes(9, 7, seed=21)  # +20 brightness, no wrap

    b1 = spark.createDataFrame(
        [(1, img_a), (2, img_b), (3, img_c)], "doc_id long, payload binary"
    )
    print(f"batch 1 admitted: {sink.write(b1)} (expect 3)")

    b2 = spark.createDataFrame(
        [
            (4, img_a),          # byte-exact redelivery -> dropped
            (5, shifted_a),      # re-encode, same perceptual hash -> dropped
            (6, img_new),        # genuinely new -> admitted
            (7, b"not an image"),  # undecodable -> skipped, never admitted
        ],
        "doc_id long, payload binary",
    )
    print(f"batch 2 admitted: {sink.write(b2)} (expect 1)")

    corpus_ids = sorted(
        r.doc_id for r in spark.read.parquet(sink.corpus_dir).collect()
    )
    print(f"corpus ids: {corpus_ids} (expect [1, 2, 3, 6])")
    print(
        f"counters: ingested={sink.ingested} dropped_dup={sink.dropped_dup} "
        f"skipped_undecodable={sink.skipped_undecodable}"
    )
    spark.sql("DROP TABLE IF EXISTS media_ingest_example_ledger")


if __name__ == "__main__":
    main()
