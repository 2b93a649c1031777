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
        if os.path.exists(p):  # partial sf dirs still sweep what they have
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


def compare(spark_df, con, sql: str, float_ulps: int = 0):
    """Returns (ok, message). Exact compare; float_ulps>0 allows that many
    ulps of float slack (used only to DIAGNOSE — the gate itself is 0)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
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
