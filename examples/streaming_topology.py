"""Runnable example: daemon-mode topology (the reference's Kinesis/SQS
shape) as a Structured Streaming query.

    python examples/streaming_topology.py

Drops CSV files into a watched directory while a streaming query tails
it through the same operator chain batch topologies use, writing gzip
CSV micro-batches through the batch FileWriter via foreachBatch — one
sink implementation serving both modes, like the reference reuses
output components across one-shot and daemon topologies.
"""

import glob
import gzip
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baker_spark import operators as ops  # noqa: E402
from baker_spark.session import get_spark  # noqa: E402
from baker_spark.sinks.filewriter import FileWriter  # noqa: E402
from baker_spark.streaming.daemon import FileStreamSource, StreamingPipeline  # noqa: E402


def main() -> None:
    spark = get_spark("streaming_example", cpus=4)
    watch = tempfile.mkdtemp(prefix="stream_in_")
    out = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")

    pipeline = StreamingPipeline(
        source=FileStreamSource(path=watch, fields=["user", "action", "value"]),
        ops=[
            ops.NotNull(["user"]),
            ops.StringMatch(field="action", strings=["noise"]),  # drop noise rows
            ops.Hash(src_field="user", dst_field="user_md5", function="md5"),
        ],
    )
    query = pipeline.start_foreach_batch(
        spark, FileWriter(path=out, compression="gzip", mode="append"), checkpoint_dir=ckpt
    )

    for i in range(3):
        with open(os.path.join(watch, f"batch_{i}.csv"), "w") as fh:
            fh.write(f"alice,click,{i}\nbob,noise,{i}\ncarol,view,{i}\n")
        time.sleep(1)

    query.processAllAvailable()
    query.stop()

    rows = []
    for p in glob.glob(f"{out}/**/*.gz", recursive=True):
        rows += [r for r in gzip.open(p, "rt").read().split("\n") if r]
    print(f"streamed {len(rows)} records (noise dropped) -> {out}")
    for r in sorted(rows)[:4]:
        print(" ", r)
    spark.stop()


if __name__ == "__main__":
    main()
