"""Query catalog — every operator from SURVEY.md §2 exercised over the
driver's synthetic tables, each with an ANSI-SQL DuckDB oracle.

Modules contribute ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]``; this package aggregates them for
``__spark_entry__``.
"""

from __future__ import annotations

from baker_spark.queries import analytics, baker_ops, datapipe_queries, extended


def all_queries() -> dict:
    out = {}
    for mod in (baker_ops, analytics, datapipe_queries, extended):
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict:
    out = {}
    for mod in (baker_ops, analytics, datapipe_queries, extended):
        out.update(mod.ORACLES)
    return out
