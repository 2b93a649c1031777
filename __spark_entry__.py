"""Driver contract for the baker_spark engine.

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
full operator catalog (SURVEY.md §2 + datapipe extensions) with DuckDB
oracles. See baker_spark/queries/ for the implementations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from baker_spark.queries.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from baker_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from baker_spark.queries import all_oracles

    return all_oracles()
