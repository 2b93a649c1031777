"""Runnable example: queue-notified ingestion through the bakersqs
streaming data source (the reference's SQS daemon as one readStream).

    python examples/notify_stream.py

A directory-backed queue stands in for SQS (each ``*.msg`` file is one
pending notification; a real deployment passes ``queue_names`` and a
boto3-resolvable region instead of ``fake_dir``). The example drops
two notifications — one plain CSV, one gzip — while the query runs,
then shows that both messages were consumed (deleted) only after their
file lists were journaled in the checkpoint, and that every record
carries the notified url + Last-Modified metadata the reference's List
input attaches (input/list.go:142-157).
"""

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baker_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("notify_stream_example", cpus=4)
    qdir = tempfile.mkdtemp(prefix="notify_q_")
    data = tempfile.mkdtemp(prefix="notify_data_")
    ckpt = tempfile.mkdtemp(prefix="notify_ckpt_")

    plain = os.path.join(data, "events.csv")
    with open(plain, "w") as fh:
        fh.write("u1,click,3\nu2,view,1\n")
    packed = os.path.join(data, "late.csv.gz")
    with open(packed, "wb") as fh:
        fh.write(gzip.compress(b"u3,click,9\n"))

    # notify the first file before the query starts
    with open(os.path.join(qdir, "a.msg"), "w") as fh:
        fh.write(plain)

    query = (
        spark.readStream.format("bakersqs")  # registered by get_spark
        .option("fake_dir", qdir)
        .option("message_format", "plain")
        .load()
        .writeStream.format("memory")
        .queryName("notify_rows")
        .option("checkpointLocation", ckpt)
        .start()
    )
    query.processAllAvailable()

    # ... and the second while it runs: the next micro-batch picks it up
    with open(os.path.join(qdir, "b.msg"), "w") as fh:
        fh.write(packed)
    query.processAllAvailable()

    rows = spark.sql(
        "SELECT value, _bk_url FROM notify_rows ORDER BY value"
    ).collect()
    for r in rows:
        print(f"  {r.value:14s} <- {os.path.basename(r._bk_url)}")
    pending = [n for n in os.listdir(qdir) if n.endswith(".msg")]
    print(f"rows={len(rows)} pending_messages={pending}")
    assert len(rows) == 3 and pending == []

    query.stop()
    spark.stop()


if __name__ == "__main__":
    main()
