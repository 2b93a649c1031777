"""Single-writer fencing for persisted artifacts (ANN index, dedup
ledgers).

The index/ledger writers are APPEND jobs against one shared directory
tree. Task-level retries are safe (Spark's output committer stages
per-task files), but a SCHEDULER that retries or doubles a whole job —
two `ann_index_add`s against one index, two ledger appends for one
batch — interleaves appends with no error and no repair signal. At
100 TB that's a real operational hazard (VERDICT r10 watch-point #1),
so every mutating entry point takes a write-intent fence first:

- acquire = atomically create ``<dir>._writer.lock`` (a SIBLING of the
  fenced directory — see :func:`_lock_path` for why in-dir markers
  self-destruct under overwrite-mode writes). On ``file:`` the
  primitive is ``java.io.File.createNewFile`` (true O_EXCL — Hadoop's
  RawLocalFileSystem ``create(overwrite=False)`` is check-then-create
  and loses real races, measured); on HDFS the Hadoop
  ``create(path, overwrite=False)`` is atomic server-side; on S3A the
  create is check-then-put (best effort), which still catches the
  scheduler-double case because the loser's check sees the winner's
  marker within list consistency (S3 is strongly consistent since
  2020).
- the marker body records who/what/when (JSON), so the error a losing
  writer raises — and the stale-lock message after a crash — names the
  holder instead of being a bare failure.
- release = delete the marker. A writer that CRASHES leaves the marker
  behind by design: the next writer fails fast with the holder's
  identity and the repair instruction (verify the job is dead, then
  :func:`break_fence`), rather than silently interleaving with a
  possibly-still-running ghost.

This is intentionally a fence, not a lease: no TTL auto-expiry,
because a slow-but-alive writer outliving a TTL is exactly the
interleaving the fence exists to prevent. Breaking it is a human (or
supervising-scheduler) decision.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager

from pyspark.sql import SparkSession

LOCK_NAME = "_writer.lock"


class ConcurrentWriterError(RuntimeError):
    """A second writer tried to mutate a fenced artifact."""


def _fs_path(spark: SparkSession, p: str):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(p)
    return hp.getFileSystem(spark._jsc.hadoopConfiguration()), hp, jvm


def _lock_path(directory: str) -> str:
    """The lock lives BESIDE the fenced directory (``<dir>._writer.lock``),
    never inside it: several fenced writes rewrite the directory's own
    contents (``saveAsTable(mode='overwrite')`` clears the table path,
    a rebuild deletes ``meta/``), and an in-dir marker would be deleted
    BY the very write it is fencing — leaving the rest of that write
    unfenced with no error (verified against Spark's overwrite path)."""
    return f"{directory.rstrip('/')}.{LOCK_NAME}"


def fence_holder(spark: SparkSession, directory: str) -> dict | None:
    """The current fence marker's JSON body, or None when unfenced."""
    fs, lock, jvm = _fs_path(spark, _lock_path(directory))
    if not fs.exists(lock):
        return None
    stream = fs.open(lock)
    try:
        # one gateway call for the whole marker (commons-io ships with
        # Spark); a python read() loop would cost one driver->JVM
        # round-trip PER BYTE of the JSON body
        buf = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    try:
        return json.loads(buf.decode())
    except ValueError:
        return {"raw": buf.decode(errors="replace")}


def break_fence(spark: SparkSession, directory: str) -> dict | None:
    """Remove a STALE fence after a writer crash. Returns the dead
    holder's marker body. Only call once the holding job is confirmed
    dead — breaking a live writer's fence re-opens the interleaving
    hazard the fence exists to close."""
    holder = fence_holder(spark, directory)
    fs, lock, _ = _fs_path(spark, _lock_path(directory))
    fs.delete(lock, False)
    return holder


def _raise_fenced(spark, directory: str, op: str, cause: Exception | None):
    holder = fence_holder(spark, directory)
    err = ConcurrentWriterError(
        f"{op}: {directory!r} is fenced by another writer "
        f"{holder if holder else ''} — a concurrent mutation would "
        "interleave appends. If that writer crashed, verify it is "
        "dead and call baker_spark.datapipe.artifacts.break_fence()."
    )
    raise err from cause


@contextmanager
def writer_fence(spark: SparkSession, directory: str, op: str):
    """Hold the single-writer fence on ``directory`` for one mutation."""
    fs, lock, jvm = _fs_path(spark, _lock_path(directory))
    # parent must exist for create(); a first build's parent may not yet
    fs.mkdirs(lock.getParent())
    marker = json.dumps(
        {
            "op": op,
            "pid": os.getpid(),
            "writer_id": uuid.uuid4().hex,
            "acquired_unix": int(time.time()),
        }
    ).encode()
    if fs.getUri().getScheme() == "file":
        # Hadoop's RawLocalFileSystem.create(overwrite=False) is
        # CHECK-then-create, NOT O_EXCL — a 6-thread race through a
        # barrier saw ALL SIX acquire (test_fence_race_exactly_one_
        # winner pins the fix). java.io.File.createNewFile is the real
        # atomic primitive on a local/POSIX-mounted artifact dir.
        local = jvm.java.io.File(lock.toUri().getPath())
        if not local.createNewFile():
            _raise_fenced(spark, directory, op, None)
        # one try spans marker-write THROUGH the yield: a failure
        # writing the body must release the lock, not orphan an
        # empty-holder fence. Only a process CRASH leaves the marker.
        try:
            with open(local.getPath(), "wb") as f:
                f.write(marker)
            yield
        finally:
            fs.delete(lock, False)
        return
    # HDFS: create(overwrite=False) is atomic server-side. S3A: the
    # create is check-then-put (best effort) — it still catches the
    # scheduler-double case because the loser's check sees the winner's
    # marker within list consistency (S3 is strongly consistent).
    try:
        out = fs.create(lock, False)
    except Exception as e:
        _raise_fenced(spark, directory, op, e)
    try:
        try:
            out.write(bytearray(marker))
        finally:
            out.close()
        yield
    finally:
        fs.delete(lock, False)
