"""Bucketed co-located join: the write-once-shuffle-never pattern.

Asserts the actual scale guarantee — the joint plan contains NO Exchange
on either side — and that results equal the plain (shuffling) join.
"""

import contextlib
import io

from pyspark.sql import functions as F

from baker_spark.sources.bucketing import bucketize, colocated_join
from baker_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark):
    # (warehouse dir is static session config; the default spark-warehouse
    # under cwd is fine — saveAsTable overwrites on re-run)
    li = bucketize(spark, SF_DIR, "lineitem", "l_orderkey", buckets=4)
    o = bucketize(spark, SF_DIR, "orders", "o_orderkey", buckets=4)

    # at test SF both sides fit the broadcast threshold, which would
    # bypass (and disable) the bucketed scan; turn it off to exercise
    # the plan shape that matters at fact-x-fact scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, li, o, "l_orderkey", "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing replaced both shuffles

        expected = (
            load_table(spark, SF_DIR, "lineitem")
            .join(
                load_table(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_seen_ledger_anti_join_leaves_ledger_unshuffled(spark, tmp_path):
    """The incremental-dedup scale fix: a ledger persisted bucketed+sorted
    by fp contributes NO exchange and NO sort to the per-batch anti-join —
    only the new batch moves, so per-batch cost stops growing with the
    (forever-growing) ledger's shuffle size."""
    from baker_spark.datapipe import dedup, text

    docs = load_table(spark, SF_DIR, "documents")
    key = text.fingerprint("text")
    new_docs = docs.filter(F.col("doc_id") >= 200)
    seen_keys = docs.filter(F.col("doc_id") < 300).select(key.alias("fp"))

    table = "seen_ledger_test"
    dedup.write_seen_ledger(
        seen_keys, table, path=str(tmp_path / "ledger"), n_buckets=4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = dedup.incremental_dedup_against_ledger(new_docs, spark, table, key)
        plan = _plan(got)
        assert "Bucketed: true" in plan          # ledger read IS the bucketed scan
        # ledger side is exchange-free: the only exchange(s) in the whole
        # plan belong to the batch (its groupBy handles the fp partitioning)
        import re

        exch_ids = re.findall(r"^\((\d+)\) Exchange", plan, re.M)
        assert len(set(exch_ids)) == 1           # exactly one: the new batch
        # hash anti-join, not sort-merge: the shuffle_hash hint keeps the
        # per-batch cost free of a full-ledger sort (measured 1.6x at a
        # 10M-key ledger, tools/ledger_bench.py)
        assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
        assert "SortMergeJoin" not in plan

        expected = sorted(
            tuple(r)
            for r in dedup.incremental_dedup(
                new_docs, docs.filter(F.col("doc_id") < 300), key
            ).collect()
        )
        assert sorted(tuple(r) for r in got.collect()) == expected
        assert expected, "fixture produced an empty batch — test is vacuous"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_seen_ledger_append_is_fenced(spark, tmp_path):
    """Two concurrent ledger appends (a scheduler doubling a whole
    ingest job) must not interleave: the loser raises naming the
    holder, and after release the append lands normally."""
    import pytest

    from baker_spark.datapipe import artifacts, dedup

    table, path = "seen_ledger_fence_test", str(tmp_path / "ledger")
    keys = spark.createDataFrame([("a",), ("b",)], "fp string")
    try:
        dedup.write_seen_ledger(keys, table, path=path, n_buckets=2)
        with artifacts.writer_fence(spark, path, "in-flight-append"):
            with pytest.raises(artifacts.ConcurrentWriterError, match="in-flight-append"):
                dedup.write_seen_ledger(
                    keys, table, path=path, n_buckets=2, mode="append"
                )
        more = spark.createDataFrame([("c",)], "fp string")
        dedup.write_seen_ledger(more, table, path=path, n_buckets=2, mode="append")
        assert artifacts.fence_holder(spark, path) is None
        assert spark.table(table).count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_band_ledger_neardup_matches_two_corpora_form_and_is_exchange_lean(
    spark, tmp_path
):
    """incremental_neardup_against_band_ledger must return the same kept
    set as the two-corpora incremental_neardup, with the ledger side
    read bucketed (no ledger exchange) and the anti-joins hash, not
    sort-merge."""
    import re

    from baker_spark.datapipe import dedup

    docs = load_table(spark, SF_DIR, "documents")
    new_docs = docs.filter(F.col("doc_id") >= 200)
    seen_docs = docs.filter(F.col("doc_id") < 300)

    table = "band_ledger_test"
    dedup.write_seen_ledger(
        dedup.band_ledger_keys(dedup.lsh_bands(seen_docs)),
        table,
        path=str(tmp_path / "bledger"),
        n_buckets=4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        kept_ids, kept_keys = dedup.incremental_neardup_against_band_ledger(
            new_docs, spark, table
        )
        plan = _plan(kept_ids)
        assert "Bucketed: true" in plan
        # the hinted ledger anti-join is hash, never a full-ledger sort;
        # the batch-sized follow-up joins may SMJ under this test's
        # forced no-broadcast regime (at real scale they broadcast)
        assert "ShuffledHashJoin" in plan

        expected = sorted(
            r["doc_id"]
            for r in dedup.incremental_neardup(new_docs, seen_docs).collect()
        )
        got = sorted(r["doc_id"] for r in kept_ids.collect())
        assert got == expected
        assert expected, "fixture produced an empty kept set — test is vacuous"
        # every kept doc contributes its band keys for the append
        assert kept_keys.count() > 0
        assert kept_keys.distinct().count() <= len(expected) * 4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_fence_survives_overwrite_of_fenced_dir(spark, tmp_path):
    """The lock lives BESIDE the fenced directory: overwrite-mode
    writes (saveAsTable / parquet mode=overwrite) clear the directory's
    own contents, so an in-dir marker would be deleted BY the very
    write it is fencing — leaving the rest of that write unfenced with
    no error (verified against Spark's overwrite path in review)."""
    import pytest

    from baker_spark.datapipe import artifacts

    path = str(tmp_path / "artifact")
    spark.createDataFrame([("a",)], "fp string").write.parquet(path)
    with artifacts.writer_fence(spark, path, "bootstrap-overwrite"):
        spark.createDataFrame([("x",)], "fp string").write.mode("overwrite").parquet(path)
        assert artifacts.fence_holder(spark, path) is not None
        with pytest.raises(artifacts.ConcurrentWriterError, match="bootstrap-overwrite"):
            with artifacts.writer_fence(spark, path, "second"):
                pass  # pragma: no cover — loser must never enter
    assert artifacts.fence_holder(spark, path) is None


def test_fence_race_exactly_one_winner(spark, tmp_path):
    """TRUE concurrency, not nested acquisition: N threads race
    writer_fence on one directory through a barrier. Exactly one enters
    (the Hadoop create(overwrite=False) is atomic-exclusive on
    local/HDFS), every loser raises ConcurrentWriterError, and the
    winner's release leaves the path unfenced."""
    import threading

    from baker_spark.datapipe import artifacts

    path = str(tmp_path / "raced")
    n = 6
    barrier = threading.Barrier(n)
    outcomes: list[str] = []
    lock = threading.Lock()

    def contender(i: int) -> None:
        barrier.wait()
        try:
            with artifacts.writer_fence(spark, path, f"racer-{i}"):
                with lock:
                    outcomes.append("won")
                import time

                time.sleep(0.3)  # hold long enough that others collide
        except artifacts.ConcurrentWriterError:
            with lock:
                outcomes.append("lost")

    threads = [threading.Thread(target=contender, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(outcomes) == ["lost"] * (n - 1) + ["won"], outcomes
    assert artifacts.fence_holder(spark, path) is None


def test_phash_ledger_neardup_matches_two_corpora_form(spark, tmp_path):
    """The image band ledger (fp + the full phash for verification) must
    reproduce incremental_neardup_phash's kept set exactly, read its
    ledger side bucketed, and VERIFY collisions — a planted 15-bit band
    collision between dissimilar hashes must not cause a drop."""
    from baker_spark.datapipe import dedup, multimodal

    docs = load_table(spark, SF_DIR, "documents")
    sigs = multimodal.media_phash(multimodal.with_pixel_payload(docs)).select(
        "doc_id", "phash"
    )
    new_sigs = sigs.filter(F.col("doc_id") % 2 == 1).persist()
    seen_sigs = sigs.filter(F.col("doc_id") % 2 == 0).persist()

    table = "phash_ledger_test"
    seen_keys = dedup.phash_bands(seen_sigs).withColumn("fp", dedup.band_fp())
    dedup.write_seen_ledger(
        seen_keys,
        table,
        path=str(tmp_path / "pledger"),
        n_buckets=4,
        extra_cols=("phash",),
    )
    try:
        kept_ids, kept_keys = dedup.incremental_neardup_against_phash_ledger(
            new_sigs, spark, table
        )
        plan = _plan(kept_ids)
        assert "Bucketed: true" in plan
        expected = sorted(
            r["doc_id"]
            for r in dedup.incremental_neardup_phash(new_sigs, seen_sigs).collect()
        )
        got = sorted(r["doc_id"] for r in kept_ids.collect())
        assert got == expected
        assert expected, "fixture produced an empty kept set — test is vacuous"
        # kept_keys carry the hash for the verified append
        assert kept_keys.columns == ["fp", "phash"]
        assert kept_keys.count() == len(expected) * 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        new_sigs.unpersist()
        seen_sigs.unpersist()


def test_phash_ingest_verifies_band_collisions(spark):
    """Two hashes that share one 15-bit band but differ in 30 bits must
    BOTH survive ingest (bare band collision is not a duplicate); a
    hamming-1 neighbor must be dropped."""
    from baker_spark.datapipe import dedup

    base = 0x0123456789ABCDE
    # shares band 0 (low 15 bits) with base, scrambles the other 45
    collider = (base & 0x7FFF) | (0x555555555 << 15)
    seen = spark.createDataFrame([(0, base)], "doc_id long, phash long")
    batch = spark.createDataFrame(
        [(1, collider), (3, base ^ 2)], "doc_id long, phash long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.incremental_neardup_phash(batch, seen).collect()
    )
    assert kept == [1], f"collider must survive, hamming-1 neighbor must drop: {kept}"


def test_compact_seen_ledger_one_file_per_bucket_same_decisions(spark, tmp_path):
    """The ingest-age decay fix (round 12): N append batches leave N
    files per bucket; compaction rewrites to ONE file per bucket while
    the anti-join's decisions, the exchange-free bucketed-scan shape,
    and the row set stay identical. Also pins crash recovery: a compact
    that died between its two renames (live missing, backup present)
    restores the live dir at the next entry."""
    import re

    from baker_spark.datapipe import dedup, text

    docs = load_table(spark, SF_DIR, "documents")
    key = text.fingerprint("text")
    table = "compact_ledger_test"
    path = str(tmp_path / "ledger")
    # 4 appends: initial write + 3 -> 4 files per bucket
    dedup.write_seen_ledger(
        docs.filter(F.col("doc_id") < 100).select(key.alias("fp")),
        table, path=path, n_buckets=4,
    )
    for lo in (100, 200, 300):
        dedup.write_seen_ledger(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100))
            .select(key.alias("fp")),
            table, path=path, n_buckets=4, mode="append",
        )
    new_docs = docs.filter(F.col("doc_id") >= 350)
    before_rows = sorted(
        tuple(r)
        for r in dedup.incremental_dedup_against_ledger(
            new_docs, spark, table, key
        ).collect()
    )
    n_ledger = spark.table(table).count()

    out = dedup.compact_seen_ledger(spark, table, path=path, n_buckets=4)
    assert out["files_before"] >= 16  # 4 appends x 4 buckets
    assert out["files_after"] == 4    # one per bucket
    assert out["rows"] == spark.table(table).count() <= n_ledger

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = dedup.incremental_dedup_against_ledger(new_docs, spark, table, key)
        plan = _plan(got)
        # still the bucketed exchange-free shape after the swap
        assert "Bucketed: true" in plan
        assert len(set(re.findall(r"^\((\d+)\) Exchange", plan, re.M))) == 1
        assert sorted(tuple(r) for r in got.collect()) == before_rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # appends keep working against the compacted table
    dedup.write_seen_ledger(
        new_docs.select(key.alias("fp")), table, path=path,
        n_buckets=4, mode="append",
    )
    assert (
        dedup.incremental_dedup_against_ledger(new_docs, spark, table, key).count()
        == 0
    )

    # crash recovery: simulate death between the renames
    import os
    import shutil

    shutil.move(path, f"{path}_precompact")
    assert not os.path.exists(path)
    out2 = dedup.compact_seen_ledger(spark, table, path=path, n_buckets=4)
    assert out2["files_after"] == 4 and os.path.exists(path)
    assert spark.table(table).count() == out2["rows"] > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_seen_ledger_preserves_extra_cols(spark, tmp_path):
    """The image band ledger stores the full phash beside each band key
    (extra_cols): compaction must carry the extra column and keep the
    verified-probe rows intact."""
    from baker_spark.datapipe import dedup

    table = "compact_media_ledger_test"
    path = str(tmp_path / "mledger")
    rows = spark.createDataFrame(
        [(f"b{i % 4}:{i}", i * 1000 + 7) for i in range(40)], "fp string, phash long"
    )
    dedup.write_seen_ledger(rows, table, path=path, n_buckets=4, extra_cols=("phash",))
    dedup.write_seen_ledger(
        rows.withColumn("phash", F.col("phash") + 1).withColumn(
            "fp", F.concat(F.col("fp"), F.lit("x"))
        ),
        table, path=path, n_buckets=4, mode="append", extra_cols=("phash",),
    )
    before = sorted(tuple(r) for r in spark.table(table).collect())
    out = dedup.compact_seen_ledger(
        spark, table, path=path, n_buckets=4, extra_cols=("phash",)
    )
    assert out["files_after"] == 4
    assert sorted(tuple(r) for r in spark.table(table).collect()) == before
    assert spark.table(table).columns == ["fp", "phash"]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_compact_seen_ledger_derives_spec_from_catalog(spark, tmp_path):
    """ADVICE r12 (medium): compaction must rewrite with the LIVE
    table's bucket count and column set, not caller defaults — a
    16-bucket fp+phash MediaIngest ledger compacted with bare defaults
    would come back 64-bucketed and phash-less while the DDL still said
    otherwise, silently re-admitting duplicates through the bucketed
    anti-join. Default-args compaction now derives the spec; explicit
    values that disagree with the live spec raise instead of rewriting."""
    import pytest

    from baker_spark.datapipe import dedup

    table = "compact_spec_ledger_test"
    path = str(tmp_path / "specledger")
    rows = spark.createDataFrame(
        [(f"k{i}", i * 11) for i in range(64)], "fp string, phash long"
    )
    dedup.write_seen_ledger(rows, table, path=path, n_buckets=16, extra_cols=("phash",))
    dedup.write_seen_ledger(
        rows.withColumn("fp", F.concat(F.col("fp"), F.lit("b"))),
        table, path=path, n_buckets=16, mode="append", extra_cols=("phash",),
    )
    assert dedup.ledger_spec(spark, table) == (16, ("phash",))
    before = sorted(tuple(r) for r in spark.table(table).collect())

    # the exact ADVICE scenario: no spec passed at all
    out = dedup.compact_seen_ledger(spark, table, path=path)
    assert out["n_buckets"] == 16 and out["files_after"] == 16
    assert dedup.ledger_spec(spark, table) == (16, ("phash",))
    assert spark.table(table).columns == ["fp", "phash"]
    assert sorted(tuple(r) for r in spark.table(table).collect()) == before

    # explicit values that contradict the live spec must refuse loudly
    with pytest.raises(ValueError, match="Num Buckets=16"):
        dedup.compact_seen_ledger(spark, table, path=path, n_buckets=64)
    with pytest.raises(ValueError, match="extra_cols"):
        dedup.compact_seen_ledger(spark, table, path=path, extra_cols=())
    # and the refused compacts left the ledger untouched
    assert sorted(tuple(r) for r in spark.table(table).collect()) == before
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ledger_append_fails_fast_during_compaction(spark, tmp_path):
    """The compaction window is writer-fenced: an ingest append landing
    mid-compact must raise ConcurrentWriterError naming the compactor
    instead of racing the directory swap (an append into the old live
    dir after the swap would be silently lost)."""
    import pytest

    from baker_spark.datapipe import artifacts, dedup

    table = "compact_fence_test"
    path = str(tmp_path / "ledger")
    rows = spark.createDataFrame([(f"k{i}",) for i in range(20)], "fp string")
    dedup.write_seen_ledger(rows, table, path=path, n_buckets=2)
    # hold the compaction fence by hand (the compact entry point takes
    # exactly this fence on the live dir)
    fence = artifacts.writer_fence(spark, path, "compact_seen_ledger(test)")
    fence.__enter__()
    try:
        with pytest.raises(artifacts.ConcurrentWriterError, match="compact_seen_ledger"):
            dedup.write_seen_ledger(
                rows, table, path=path, n_buckets=2, mode="append"
            )
    finally:
        fence.__exit__(None, None, None)
    # released: appends flow again
    dedup.write_seen_ledger(rows, table, path=path, n_buckets=2, mode="append")
    assert spark.table(table).count() == 40
    spark.sql(f"DROP TABLE IF EXISTS {table}")
