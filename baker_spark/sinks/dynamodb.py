"""DynamoDB sink (/root/reference/output/dyndb.go:20-31).

Reference semantics re-implemented per executor partition (the infra —
goroutines/channels — is replaced by ``foreachPartition`` tasks):

- 25-item batch_write_item requests (dyndb.go:33,307-364)
- ``s:``/``n:`` typed column declarations, first column is the primary
  key (dyndb.go:25-30, validation 234-243)
- duplicate-PK skip within one batch (DynamoDB rejects them)
- token-bucket MaxWritesPerSec rate limit per writer (dyndb.go:171-175)
- retry with exponential backoff on UnprocessedItems (dyndb.go:366-389)

boto3 is not bundled in this environment, so the client is injected: any
object with ``batch_write_item(RequestItems=...) -> {"UnprocessedItems":
{...}}``. ``client_factory=None`` tries boto3 and raises a clear error if
unavailable. Note: Spark task retries make delivery at-least-once —
DynamoDB puts are idempotent per PK, so replays overwrite, not duplicate.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

BATCH_SIZE = 25  # DynamoDB batch_write_item hard limit (dyndb.go:33)


def _default_client_factory(regions: list[str], endpoint_url: str = ""):
    try:
        import boto3  # type: ignore
    except ImportError as e:  # pragma: no cover - boto3 absent in this env
        raise RuntimeError(
            "boto3 is not installed; pass client_factory= to DynamoDBWriter"
        ) from e
    kw = {"endpoint_url": endpoint_url} if endpoint_url else {}
    return [boto3.client("dynamodb", region_name=r, **kw) for r in regions]


def _to_item(columns: list[str], types: list[str], row) -> dict:
    item = {}
    for col, typ in zip(columns, types):
        v = row[col]
        if v is None or v == "":
            continue
        if typ == "n":
            float(v)  # validate number like dyndb.go:234-243
            item[col] = {"N": str(v)}
        else:
            item[col] = {"S": str(v)}
    return item


class _TokenBucket:
    """MaxWritesPerSec limiter (dyndb.go:171-175)."""

    def __init__(self, rate: int):
        self.rate = rate
        self.allowance = float(rate)
        self.last = time.monotonic()

    def take(self, n: int = 1):
        if self.rate <= 0:
            return
        while True:
            now = time.monotonic()
            # burst cap must admit the request: clamping to `rate` alone
            # would make take(25) with rate=10 spin forever — allowance
            # can never reach n (a 25-item batch at 10/sec legitimately
            # waits 2.5s, it must not hang)
            cap = float(max(self.rate, n))
            self.allowance = min(cap, self.allowance + (now - self.last) * self.rate)
            self.last = now
            if self.allowance >= n:
                self.allowance -= n
                return
            time.sleep((n - self.allowance) / self.rate)


def write_batches(
    rows,
    *,
    table: str,
    columns: list[str],
    types: list[str],
    clients,
    max_writes_per_sec: int = 0,
    max_backoff: float = 2.0,
) -> dict:
    """Core batching loop — pure enough to unit-test with a fake client."""
    bucket = _TokenBucket(max_writes_per_sec)
    stats = {"written": 0, "skipped_dup_pk": 0, "retries": 0}
    pk = columns[0]
    batch: list[dict] = []
    seen_pks: set[str] = set()

    def flush():
        if not batch:
            return
        bucket.take(len(batch))
        for client in clients:
            request = {table: [{"PutRequest": {"Item": it}} for it in batch]}
            backoff = 0.05
            while request[table]:
                resp = client.batch_write_item(RequestItems=request)
                unprocessed = (resp or {}).get("UnprocessedItems", {})
                if not unprocessed.get(table):
                    break
                stats["retries"] += 1
                request = unprocessed
                # retried items are REAL write traffic: charge them
                # against max_writes_per_sec too, or a throttled table
                # gets hammered outside the configured rate exactly when
                # it is already over capacity. Retries stay unbounded
                # with capped backoff — the reference's own semantics
                # (dyndb.go:120-143 loops until UnprocessedItems drains,
                # MaxBackoff caps the WAIT, not the attempts).
                bucket.take(len(request[table]))
                time.sleep(backoff)
                backoff = min(backoff * 2, max_backoff)
        stats["written"] += len(batch)
        batch.clear()
        seen_pks.clear()

    for row in rows:
        try:
            item = _to_item(columns, types, row)
        except ValueError:
            # malformed n: value — one bad row must not abort the task
            # (and with it the whole job, mid-write, after some batches
            # already landed); count it like the reference's errn
            # skipped-lines counter (dyndb.go:202)
            stats["skipped_bad_number"] = stats.get("skipped_bad_number", 0) + 1
            continue
        if pk not in item:
            # empty/NULL PK: _to_item skips empty values, and an item
            # without the hash key makes DynamoDB reject the ENTIRE
            # 25-item batch with ValidationException — count and skip
            # the row instead of poisoning its batch
            stats["skipped_empty_pk"] = stats.get("skipped_empty_pk", 0) + 1
            continue
        key = str(item.get(pk))
        if key in seen_pks:  # dup PK within batch -> skip (dyndb.go docs)
            stats["skipped_dup_pk"] += 1
            continue
        seen_pks.add(key)
        batch.append(item)
        if len(batch) >= BATCH_SIZE:
            flush()
    flush()
    return stats


@dataclass
class DynamoDBWriter:
    """Batch-write records to DynamoDB: 25-item batches, s:/n: typed
    columns (first = PK), dup-PK skip, token-bucket rate limit, backoff
    retries (output/dyndb.go:20-31)."""

    table: str
    columns: list[str]  # declared as 's:name' / 'n:name', first = PK
    regions: list[str] = field(default_factory=lambda: ["us-west-2"])
    max_writes_per_sec: int = 0
    #: MaxBackoff (dyndb.go:173, default "2m"): cap on the retry backoff
    #: for UnprocessedItems before giving up growing the wait
    max_backoff: float = 120.0
    client_factory: Callable | None = None
    #: LocalStack/moto/VPC endpoint for the DEFAULT factory (ignored
    #: when client_factory is injected)
    endpoint_url: str = ""

    def __post_init__(self):
        # validate BEFORE splitting: a column missing its ':' prefix must
        # produce the clear error, not an IndexError from split()[1]
        bad = [c for c in self.columns if ":" not in c or c.split(":", 1)[0] not in ("s", "n")]
        if bad:
            raise ValueError(f"column types must be 's:' or 'n:', got {bad}")
        self._names = [c.split(":", 1)[1] for c in self.columns]
        self._types = [c.split(":", 1)[0] for c in self.columns]

    def write(self, df: DataFrame) -> None:
        table, names, types = self.table, self._names, self._types
        regions, rate = self.regions, self.max_writes_per_sec
        backoff_cap = self.max_backoff
        endpoint = self.endpoint_url
        factory = self.client_factory or (
            lambda rs: _default_client_factory(rs, endpoint)
        )

        def per_partition(rows):
            clients = factory(regions)
            write_batches(
                rows,
                table=table,
                columns=names,
                types=types,
                clients=clients,
                max_writes_per_sec=rate,
                max_backoff=backoff_cap,
            )

        df.select(*names).foreachPartition(per_partition)
