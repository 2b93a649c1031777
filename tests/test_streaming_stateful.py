"""Custom stateful streaming operator tests (applyInPandasWithState)."""

from baker_spark.streaming.daemon import FileStreamSource
from baker_spark.streaming.stateful import running_counter, session_aggregator


def _write(path, rows):
    path.write_text("\n".join(rows) + "\n")


def test_running_counter_across_batches(spark, tmp_path):
    src = tmp_path / "rc_in"
    src.mkdir()
    _write(src / "a.csv", ["u1,10", "u1,5", "u2,1"])

    df = FileStreamSource(str(src), fields=["user", "amount"]).dataframe(spark)
    counted = running_counter(df, key_col="user", value_col="amount")
    q = counted.writeStream.format("memory").queryName("rc_out").outputMode("update").start()
    try:
        q.processAllAvailable()
        got = {
            r.user: (r.running_count, r.running_sum)
            for r in spark.sql("SELECT * FROM rc_out").collect()
        }
        assert got == {"u1": (2, 15.0), "u2": (1, 1.0)}

        # second batch: state carries over between micro-batches
        _write(src / "b.csv", ["u1,100"])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT running_count, running_sum FROM rc_out WHERE user='u1' ORDER BY running_count DESC"
        ).collect()
        assert (rows[0].running_count, rows[0].running_sum) == (3, 115.0)
    finally:
        q.stop()


def test_session_aggregator_gap_split(spark, tmp_path):
    src = tmp_path / "sa_in"
    src.mkdir()
    # two sessions for u1 within one batch (gap > 1800s between them)
    _write(src / "a.csv", ["u1,1000", "u1,1100", "u1,9000", "u2,50"])

    df = FileStreamSource(str(src), fields=["user", "sec"]).dataframe(spark)
    sessions = session_aggregator(df, key_col="user", ts_col="sec", gap_seconds=1800)
    q = sessions.writeStream.format("memory").queryName("sa_out").outputMode("append").start()
    try:
        q.processAllAvailable()
        rows = {
            (r.user, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM sa_out").collect()
        }
        # the first u1 session closed because 9000 - 1100 > 1800;
        # the second u1 session and u2's stay open in state
        assert rows == {("u1", 1000, 1100, 2)}
    finally:
        q.stop()


def test_ttl_dedup(spark, tmp_path):
    """A key passes once per TTL window of event time: duplicates inside
    the window drop, a later re-occurrence is fresh; state persists
    across micro-batches."""
    from baker_spark.streaming.stateful import ttl_dedup

    src = tmp_path / "ttl_in"
    src.mkdir()
    (src / "a.csv").write_text("k1,100\nk1,200\nk2,100\n")

    from baker_spark.streaming.daemon import FileStreamSource
    from pyspark.sql import functions as F

    stream = FileStreamSource(str(src), fields=["key", "ts"]).dataframe(spark)
    stream = stream.withColumn("ts", F.col("ts").cast("long"))
    q = (
        ttl_dedup(stream, "key", "ts", ttl_seconds=1000)
        .writeStream.format("memory")
        .queryName("ttl_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.key, r.ts) for r in spark.sql("SELECT * FROM ttl_out").collect()}
        # k1@200 is within 1000s of k1@100 -> dropped
        assert got == {("k1", 100), ("k2", 100)}

        # next batch: k1@900 still inside TTL, k1@1500 is fresh
        (src / "b.csv").write_text("k1,900\nk1,1500\n")
        q.processAllAvailable()
        got = {(r.key, r.ts) for r in spark.sql("SELECT * FROM ttl_out").collect()}
        assert got == {("k1", 100), ("k2", 100), ("k1", 1500)}
    finally:
        q.stop()


def test_session_aggregator_late_event_never_rewinds(spark, tmp_path):
    """A cross-batch late event extends session_start backward but must
    never rewind session_end — the old `last = t` emitted sessions with
    end < start."""
    src = tmp_path / "late_in"
    src.mkdir()
    _write(src / "a.csv", ["u1,1000", "u1,1100"])

    df = FileStreamSource(str(src), fields=["user", "sec"]).dataframe(spark)
    sessions = session_aggregator(df, key_col="user", ts_col="sec", gap_seconds=1800)
    q = sessions.writeStream.format("memory").queryName("late_out").outputMode("append").start()
    try:
        q.processAllAvailable()
        # batch 2: a LATE event (900 < stored last=1100), then batch 3
        # closes the session with a far-future event
        _write(src / "b.csv", ["u1,900"])
        q.processAllAvailable()
        _write(src / "c.csv", ["u1,99999"])
        q.processAllAvailable()
        rows = [
            (r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM late_out WHERE user='u1'").collect()
        ]
        assert rows == [(900, 1100, 3)]  # start extended back, end intact
    finally:
        q.stop()
