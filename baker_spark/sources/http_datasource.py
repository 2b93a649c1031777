"""Executor-side http(s) line reader — a Spark 4 Python data source.

The reference's List input downloads http(s) URLs on whatever worker
picks the file up and records the ORIGINAL url plus the Last-Modified
response header as per-record metadata (/root/reference/input/list.go:
142-157,432-440). The old Spark disposition here spooled each URL to a
driver-local file and scanned the spool, which was wrong twice at
scale: every byte of every URL squeezed through the driver, and the
metadata columns carried the spool path + spool mtime instead of the
reference's url + header values.

This module replaces the spool with a ``pyspark.sql.datasource``
implementation: one input partition per URL, fetched INSIDE the task
with stdlib urllib, decompressed by extension (gzip via stdlib, zstd
via pyarrow — same codecs the file path honors), and emitted as Arrow
record batches of ``(value, _bk_url, _bk_last_modified)``. The driver
only ever sees the URL list; a 1000-executor cluster pulls 1000 URLs
concurrently. Non-200 responses fail the task loudly, like the
reference's httpGet (list.go:437-439); a missing/garbled Last-Modified
header yields NULL (the reference parses it with ``_`` error drop into
the zero time — list.go:150-151).
"""

from __future__ import annotations

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: newline-separated URL list option (one string option per contract)
URLS_OPTION = "urls"

SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType(), True),
        T.StructField("_bk_url", T.StringType(), True),
        T.StructField("_bk_last_modified", T.TimestampType(), True),
    ]
)

def _parse_last_modified(header: str | None):
    """``Last-Modified: Mon, 02 Jan 2006 15:04:05 GMT`` -> naive UTC
    datetime, or None when absent/unparseable (reference drops the
    parse error and keeps the zero value, list.go:150-151 — NULL is the
    honest Spark analog)."""
    if not header:
        return None
    from email.utils import parsedate_to_datetime

    try:
        dt = parsedate_to_datetime(header)
    except (TypeError, ValueError):
        return None
    if dt.tzinfo is not None:
        from datetime import timezone

        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def fetch_lines(url: str):
    """Yield decoded text lines of one URL — runs in the task. Split on
    ``\\n`` with a trailing-``\\r`` strip, the same newline dialect the
    Hadoop text/CSV readers apply to the file-backed branch."""
    stream, last_modified = open_url_stream(url)
    for block in iter_line_blocks(stream):
        for line in block:
            yield line, last_modified


#: no response (or no body bytes) for this long -> fail the task rather
#: than wedge it forever: Spark retries tasks, it cannot time them out
FETCH_TIMEOUT_S = 60.0


def decompress_by_extension(raw, name: str):
    """``raw byte stream + file name -> decompressed byte stream`` —
    the one extension-to-codec dispatch every fetch path shares
    (http, the bakersqs local branch)."""
    if name.endswith(".gz"):
        import gzip

        return gzip.GzipFile(fileobj=raw)
    if name.endswith((".zst", ".zstd")):
        import pyarrow as pa

        return pa.input_stream(raw, compression="zstd")
    return raw


def open_url_stream(url: str):
    """GET one URL -> (decompressed byte stream, Last-Modified or None).
    Non-200 raises like the reference's httpGet (list.go:437-439)."""
    import urllib.request

    resp = urllib.request.urlopen(url, timeout=FETCH_TIMEOUT_S)  # noqa: S310 — user-supplied source list
    status = getattr(resp, "status", 200)
    if status != 200:
        raise IOError(f"error file {url!r} return {status} code")
    last_modified = _parse_last_modified(resp.headers.get("Last-Modified"))
    return decompress_by_extension(resp, url.split("?", 1)[0]), last_modified


#: bytes pulled per block — also the Arrow batch granularity, so one
#: knob bounds both network buffering and per-batch memory
_BLOCK_BYTES = 8 << 20


def iter_line_blocks(stream):
    """Chunked line splitter: read ~8 MB, split on ``\\n`` with
    ``str.split`` (one C call per block instead of a Python-level loop
    per line — measured ~2x on the 16-URL localhost bench), carry the
    partial last line into the next block. A multi-byte UTF-8 char
    spanning a block boundary is handled by the incremental decoder;
    ``\\r`` stripping and empty-line drops only pay when present."""
    import codecs

    dec = codecs.getincrementaldecoder("utf-8")("replace")
    carry = ""
    while True:
        data = stream.read(_BLOCK_BYTES)
        if not data:
            break
        text = carry + dec.decode(data)
        lines = text.split("\n")
        carry = lines.pop()
        if "\r" in text:
            lines = [ln[:-1] if ln.endswith("\r") else ln for ln in lines]
        if "" in lines:
            lines = [ln for ln in lines if ln]
        if lines:
            yield lines
    tail = carry + dec.decode(b"", True)
    if tail.endswith("\r"):
        tail = tail[:-1]
    if tail:
        yield [tail]


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class HttpLinesReader(DataSourceReader):
    def __init__(self, options):
        urls = (options.get(URLS_OPTION) or "").split("\n")
        self.urls = [u for u in (u.strip() for u in urls) if u]
        if not self.urls:
            raise ValueError(f"bakerhttp needs a non-empty {URLS_OPTION!r} option")

    def partitions(self):
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition):
        import pyarrow as pa

        url = partition.url
        arrow_ts = pa.timestamp("us")
        stream, lastmod = open_url_stream(url)
        for block in iter_line_blocks(stream):
            n = len(block)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(block, pa.string()),
                    pa.array([url] * n, pa.string()),
                    pa.array([lastmod] * n, arrow_ts),
                ],
                names=["value", "_bk_url", "_bk_last_modified"],
            )


class HttpLinesDataSource(DataSource):
    """``spark.read.format("bakerhttp").option("urls", ...)`` — one
    partition per URL, executor-side fetch, reference metadata."""

    @classmethod
    def name(cls) -> str:
        return "bakerhttp"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return HttpLinesReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on this session."""
    spark.dataSource.register(HttpLinesDataSource)
