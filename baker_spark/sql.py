"""SQL surface: register the table catalog and run ad-hoc SQL.

The reference has no SQL (SURVEY.md §2.6); on Spark the entire operator
surface is also reachable through ``spark.sql`` once views exist —
Catalyst produces the same plans either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from baker_spark.sources.tables import register_views


def open_catalog(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view."""
    register_views(spark, sf_dir)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    open_catalog(spark, sf_dir)
    return spark.sql(query)
