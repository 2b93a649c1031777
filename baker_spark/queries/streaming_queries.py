"""Streaming operators under the driver-style DuckDB oracle.

The streaming surface (watermarked dedup, applyInPandasWithState
running counters / session closure, the CorpusIngest foreachBatch
loop) was pytest-gated but absent from the ``queries()`` catalog —
VERDICT r10 #5 asked for catalog rows the driver can hash-gate. Each
query here REALLY RUNS Structured Streaming: the fixture table is
staged as ordered single-file "arrival" parquet files, consumed with
``maxFilesPerTrigger=1`` (one micro-batch per file), materialized
through a memory sink or foreachBatch, and the FINAL table is returned
for the row/schema/hash compare against an ANSI-SQL oracle over the
same fixture.

Oracle-ability disciplines the design: each query's result is either
batch-boundary-INSENSITIVE (distinct set, total counts) or the batches
are staged in strict event order so closure semantics (sessions) have
a closed-form SQL equivalent. That mirrors how a deployment replays a
stream for backfill — arrival order is the contract, and these rows
pin that the streaming operators converge to the batch answer on an
ordered replay.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from baker_spark.datapipe import text
from baker_spark.queries.registry import make_registry
from baker_spark.sources.tables import load_table

QUERIES, ORACLES, query = make_registry()

N_BATCHES = 3


def _stage_batches(df: DataFrame, order_col: str, n: int = N_BATCHES) -> str:
    """Write ``df`` as ``n`` single-file parquet 'arrivals' ordered by
    ``order_col`` — file i holds the (i/n, (i+1)/n] percentile range, so
    every row of file i precedes every row of file i+1 (ties never
    straddle: range bounds are values of the column itself, and a tie
    filters to exactly one side). Ascending mtimes pin the file-stream
    pickup order. This is harness STAGING, not the operator under test
    — a real deployment's arrivals are already discrete files/messages.
    """
    bounds = [
        b
        for b in df.agg(
            F.expr(
                f"percentile({order_col}, array({', '.join(str((i + 1) / n) for i in range(n - 1))}))"
            )
        ).first()[0]
    ]
    stream_dir = tempfile.mkdtemp(prefix="bkstream_src_")
    lo = None
    staged = 0
    for i in range(n):
        hi = bounds[i] if i < n - 1 else None
        part = df
        if lo is not None:
            part = part.filter(F.col(order_col) > lo)
        if hi is not None:
            part = part.filter(F.col(order_col) <= hi)
        staged += part.count()
        tmp = os.path.join(stream_dir, f"_stage_{i}")
        part.coalesce(1).write.parquet(tmp)
        src = next(
            f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = os.path.join(stream_dir, f"{i:03d}.parquet")
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        lo = hi
    # every source row must land in exactly one file: a NULL order
    # value fails BOTH range filters and would vanish from the stream
    # while the SQL oracle still counts it — a harness drop that would
    # surface as an operator hash mismatch with no hint of the cause
    total = df.count()
    if staged != total:
        raise AssertionError(
            f"_stage_batches dropped {total - staged} of {total} rows — "
            f"is {order_col!r} NULL for some rows? The percentile bands "
            "partition only non-NULL values."
        )
    return stream_dir


def _run_stream(spark: SparkSession, stream_df, sink_fn=None, mode="update") -> str | None:
    """Start, drain (processAllAvailable), stop. With ``sink_fn`` the
    stream runs through foreachBatch; otherwise into a uniquely-named
    memory sink (``mode`` must match the query's state operator —
    append for append-mode applyInPandasWithState) whose table name is
    returned."""
    ckpt = tempfile.mkdtemp(prefix="bkstream_ckpt_")
    if sink_fn is not None:
        q = (
            stream_df.writeStream.foreachBatch(sink_fn)
            .option("checkpointLocation", ckpt)
            .start()
        )
        name = None
    else:
        name = f"bkstream_{uuid.uuid4().hex[:10]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        # the checkpoint is replay state for a query that just finished
        # for good — repeated sweeps otherwise accumulate one state
        # store per query run in /tmp
        shutil.rmtree(ckpt, ignore_errors=True)
    return name


#: event-time synthesized from content length: duplicates of one text
#: share it, distinct texts spread over 10 minutes — well inside the
#: 1-hour watermark delay, so ordered-replay eviction never drops rows
_TS_SQL = "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0, n_chars % 600)"
_TS_DUCK = "TIMESTAMP '2026-01-01 00:00:00' + to_seconds(n_chars % 600)"


@query(
    "dp_streaming_dedup",
    f"""
SELECT DISTINCT {text.duck_fingerprint('text')} AS fp FROM documents
""",
)
def dp_streaming_dedup(spark, sf_dir):
    """StreamingDedup (watermark-bounded dropDuplicatesWithinWatermark —
    the documented deviation from the reference's grow-forever dedup
    set, streaming/daemon.py) replayed over 3 ordered micro-batches of
    the documents table: the surviving fp set must equal the batch
    DISTINCT of the dedup FIELDS — the key is the fields alone
    (dedup.go:60), so a redelivery with a shifted event time still
    drops; the event-time column rides along only for the watermark.
    Returning fp (not the survivor's timestamp) keeps the row
    deterministic: which arrival survives within a micro-batch is not,
    and this corpus has rolling-hash fp collisions across texts with
    different lengths (hence different synthesized event times)."""
    from baker_spark.streaming.daemon import StreamingDedup

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        text.fingerprint("text").alias("fp"),
        F.expr(_TS_SQL).alias("ts"),
        "doc_id",
    )
    stream_dir = _stage_batches(keyed, "doc_id")
    try:
        stream = (
            spark.readStream.schema(keyed.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
            .drop("doc_id")
        )
        deduped = StreamingDedup(["fp"], event_time_col="ts", delay="1 hour").apply(stream)
        name = _run_stream(spark, deduped)
    finally:
        # the memory sink holds the result rows driver-side; the staged
        # arrivals are fully consumed once the stream drains
        shutil.rmtree(stream_dir, ignore_errors=True)
    return spark.table(name).select("fp")


@query(
    "dp_streaming_running_counter",
    """
SELECT event_type, count(*) AS n_events
FROM events GROUP BY event_type
""",
)
def dp_streaming_running_counter(spark, sf_dir):
    """running_counter (applyInPandasWithState, the stateful
    CountAndTag generalization) over 3 micro-batches of events: the
    per-key running count after the last batch must equal the batch
    GROUP BY count. The update-mode memory sink keeps every emission;
    the max per key is the final state — batch-boundary insensitive."""
    from baker_spark.streaming.stateful import running_counter

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    stream_dir = _stage_batches(ev, "event_id")
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        counted = running_counter(stream, key_col="event_type")
        name = _run_stream(spark, counted)
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.max("running_count").alias("n_events"))
    )


@query(
    "dp_streaming_sessions",
    """
WITH t AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev_sec
  FROM events
),
s AS (
  SELECT user_id, sec,
         CAST(sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM t
)
SELECT CAST(user_id AS VARCHAR) AS user_id,
       min(sec) AS session_start, max(sec) AS session_end,
       count(*) AS n_events
FROM s
GROUP BY user_id, session_id
QUALIFY session_id < max(session_id) OVER (PARTITION BY user_id)
""",
)
def dp_streaming_sessions(spark, sf_dir):
    """session_aggregator (custom stateful sessionization) over 3
    event-time-ordered micro-batches: every session CLOSED by later
    data must match the batch gaps-and-islands answer; each key's final
    session stays open in state (append mode emits nothing for it), so
    the oracle excludes the last session per user. This row pins the
    cross-batch state carry — the session that spans a file boundary
    must not split."""
    from baker_spark.streaming.stateful import session_aggregator

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_id"),
        F.unix_timestamp("ts").alias("sec"),
    )
    stream_dir = _stage_batches(ev, "sec")
    try:
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        sessions = session_aggregator(stream, key_col="user_id", ts_col="sec", gap_seconds=1800)
        name = _run_stream(spark, sessions, mode="append")
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
    return spark.table(name).select(
        "user_id", "session_start", "session_end", "n_events"
    )


@query(
    "dp_streaming_ingest_ledger",
    f"""
SELECT min(doc_id) AS doc_id
FROM documents GROUP BY {text.duck_fingerprint('text')}
""",
)
def dp_streaming_ingest_ledger(spark, sf_dir):
    """The CorpusIngest loop (datapipe/ingest.py) as a foreachBatch
    sink over 3 doc_id-ordered micro-batches: each batch dedups within
    itself and anti-joins the persistent fingerprint ledger; the FINAL
    corpus directory must hold exactly the min-doc_id survivor per
    fingerprint — the same answer the batch dedup gives. Cross-batch
    redelivery/ordering is what the ledger exists for; this row pins
    it under the driver's hash gate."""
    from baker_spark.datapipe.ingest import CorpusIngest

    docs = load_table(spark, sf_dir, "documents")
    stream_dir = _stage_batches(docs, "doc_id")
    base = tempfile.mkdtemp(prefix="bkstream_ingest_")
    # the corpus dir must OUTLIVE this function — the returned frame
    # reads it lazily and the driver collects later — so it is cleaned
    # at interpreter exit rather than here (stage/checkpoint dirs, by
    # contrast, are fully consumed once the stream drains)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    ing = CorpusIngest(
        corpus_dir=f"{base}/corpus",
        ledger_dir=f"{base}/ledger",
        key=text.fingerprint("text"),
    )
    try:
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        _run_stream(spark, stream, sink_fn=lambda batch, _bid: ing.write(batch))
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)
    return spark.read.parquet(ing.corpus_dir).select("doc_id")
