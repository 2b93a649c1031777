"""Replicates the driver's correctness gate: run the Spark query and the
DuckDB oracle on the same parquet tables, sort columns by name and rows
by value, compare exactly (the driver hashes values, so approximate
equality is not good enough)."""

from __future__ import annotations

import datetime
import decimal
import math
import sys

import duckdb

from baker_spark.sources.tables import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # chunk-written tables (the sf100 generators) are DIRECTORIES
            # of part files — glob them like Spark's directory scan does
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):  # partial sf dirs still sweep what they have
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, list):
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, bytes):
        return ("b", v)
    return (type(v).__name__, v)


def _rows_sorted(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=repr)


#: above this row count the exact sorted-tuple compare switches to a
#: streamed multiset digest: materializing + sorting two 30M-row result
#: sets costs ~40 GB and tens of minutes, while the digest is O(1)
#: memory and exactly as strict (sum of per-row md5s over the SAME
#: normalized representation — a multiset equality check, matching the
#: driver's value-hash gate even more closely than the sorted compare)
BIG_RESULT_ROWS = 1_000_000


def _row_digest(cols_sorted_idx, row, acc):
    import hashlib

    norm = tuple(_norm(row[i]) for i in cols_sorted_idx)
    h = int.from_bytes(hashlib.md5(repr(norm).encode()).digest(), "big")
    return (acc + h) % (1 << 160)


def _digest_compare(spark_df, rel, s_cols, d_cols, n_duck):
    s_idx = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_idx = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    s_acc, n_spark = 0, 0
    for row in spark_df.toLocalIterator():  # memory-bounded stream
        s_acc = _row_digest(s_idx, tuple(row), s_acc)
        n_spark += 1
    if n_spark != n_duck:
        return False, f"row count mismatch: spark={n_spark} duck={n_duck}"
    d_acc = 0
    while True:
        batch = rel.fetchmany(100_000)
        if not batch:
            break
        for row in batch:
            d_acc = _row_digest(d_idx, row, d_acc)
    if s_acc != d_acc:
        return False, f"multiset digest mismatch over {n_duck} rows"
    return True, f"OK ({n_duck} rows, digest)"


def compare(spark_df, con, sql: str, float_ulps: int = 0):
    """Returns (ok, message). Exact compare; float_ulps>0 allows that many
    ulps of float slack (used only to DIAGNOSE — the gate itself is 0).
    Results above BIG_RESULT_ROWS stream through a multiset digest
    instead of materializing (same normalization, same strictness). The
    branch probes the DUCKDB side's count — one cheap local query —
    because sizing the Spark side first would re-run the whole lineage."""
    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"

    n_duck = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    if n_duck > BIG_RESULT_ROWS:
        return _digest_compare(spark_df, rel, s_cols, d_cols, n_duck)

    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = rel.fetchall()

    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"

    _, s_sorted = _rows_sorted(s_cols, s_rows)
    _, d_sorted = _rows_sorted(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if a != b:
            if float_ulps and _close(a, b, float_ulps):
                continue
            return False, f"row {i} differs:\n  spark={a}\n  duck ={b}"
    return True, f"OK ({len(s_rows)} rows)"


def _close(a, b, ulps):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if (
            x[0] == "f"
            and y[0] == "f"
            and math.isclose(x[1], y[1], rel_tol=ulps * sys.float_info.epsilon)
        ):
            continue
        return False
    return True
