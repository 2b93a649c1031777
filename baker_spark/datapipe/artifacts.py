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
  ``create(path, overwrite=False)`` is atomic server-side; on
  s3://...s3a:// the primitive is S3's native conditional write —
  ``PutObject`` with ``If-None-Match: *`` (supported by AWS since
  2024-08), which the service rejects with 412 when the key exists, so
  the second of two RACING acquirers loses deterministically
  server-side (round 12, replacing the best-effort check-then-put
  that only caught sequenced doubles). The S3 leg runs through boto3
  (honoring AWS_ENDPOINT_URL_S3 / standard credential resolution), not
  the Hadoop FS, so it needs no s3a jars and works from a bare driver.
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


_S3_SCHEMES = ("s3", "s3a", "s3n")


def _s3_split(url: str) -> tuple[str, str]:
    from urllib.parse import urlparse

    u = urlparse(url)
    return u.netloc, u.path.lstrip("/")


def _s3_client():
    import boto3

    # boto3 >= 1.28 resolves AWS_ENDPOINT_URL_S3 natively; passing it
    # explicitly keeps older stacks (and test monkeypatching) honest
    return boto3.client("s3", endpoint_url=os.environ.get("AWS_ENDPOINT_URL_S3") or None)


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


def _scheme(directory: str) -> str:
    return directory.split("://", 1)[0].lower() if "://" in directory else ""


def fence_holder(spark: SparkSession, directory: str) -> dict | None:
    """The current fence marker's JSON body, or None when unfenced."""
    if _scheme(directory) in _S3_SCHEMES:
        from botocore.exceptions import ClientError

        bucket, key = _s3_split(_lock_path(directory))
        try:
            buf = _s3_client().get_object(Bucket=bucket, Key=key)["Body"].read()
        except ClientError as e:
            if e.response.get("Error", {}).get("Code") in ("NoSuchKey", "404"):
                return None
            raise
        try:
            return json.loads(buf.decode())
        except ValueError:
            return {"raw": buf.decode(errors="replace")}
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
    if _scheme(directory) in _S3_SCHEMES:
        bucket, key = _s3_split(_lock_path(directory))
        _s3_client().delete_object(Bucket=bucket, Key=key)
        return holder
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
    marker = json.dumps(
        {
            "op": op,
            "pid": os.getpid(),
            "writer_id": uuid.uuid4().hex,
            "acquired_unix": int(time.time()),
        }
    ).encode()
    if _scheme(directory) in _S3_SCHEMES:
        # S3 native conditional write: PutObject If-None-Match:* is
        # rejected 412 server-side when the key exists — a TRUE atomic
        # create-if-absent, closing the scheduler-double race even when
        # both acquirers PUT in the same instant (the old check-then-put
        # only caught sequenced doubles). No s3a jars involved.
        from botocore.exceptions import ClientError

        bucket, key = _s3_split(_lock_path(directory))
        s3 = _s3_client()
        try:
            s3.put_object(Bucket=bucket, Key=key, Body=marker, IfNoneMatch="*")
        except ClientError as e:
            code = e.response.get("Error", {}).get("Code")
            if code in ("PreconditionFailed", "ConditionalRequestConflict", "412"):
                _raise_fenced(spark, directory, op, e)
            raise
        try:
            yield
        finally:
            s3.delete_object(Bucket=bucket, Key=key)
        return
    fs, lock, jvm = _fs_path(spark, _lock_path(directory))
    # parent must exist for create(); a first build's parent may not yet
    fs.mkdirs(lock.getParent())
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
    # HDFS (and other Hadoop FSes with real namespaces):
    # create(overwrite=False) is atomic server-side. s3/s3a never
    # reaches here — the boto3 conditional-PUT branch above owns it.
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
