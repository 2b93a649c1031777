"""Deterministic cross-engine hashing.

Spark's native ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so every hash the correctness oracle needs to reproduce is
derived from md5 (identical in both engines). A 60-bit integer hash is
taken from the first 15 hex chars of the md5 digest — always positive,
always fits in an int64 in both engines.

The reference hashes with md5/sha256 too (/root/reference/filter/hash.go:67-96)
and shards with FNV (/root/reference/examples/sharding/shard.go:10-27);
md5-derived integers give the same "stable hash -> partition/bucket"
capability with cross-engine reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: number of md5 hex chars used for the integer hash (15 -> 60 bits, < 2^63).
HEX_CHARS = 15


def md5_long(col: Column | str, salt: str | None = None, nchars: int = HEX_CHARS) -> Column:
    """Spark: 60-bit non-negative integer hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt + "|"), c)
    return F.conv(F.substring(F.md5(c), 1, nchars), 16, 10).cast("long")


def duck_md5_long(expr: str, salt: str | None = None, nchars: int = HEX_CHARS) -> str:
    """DuckDB SQL string computing the identical 60-bit hash."""
    if salt is not None:
        expr = f"concat('{salt}|', {expr})"
    return f"CAST(concat('0x', substr(md5({expr}), 1, {nchars})) AS BIGINT)"
