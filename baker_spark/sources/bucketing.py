"""Bucketed (co-located) tables — the shuffle-elimination path for
repeated joins on the same key.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders) is
shuffling both sides on the key. Writing the tables bucketed+sorted by
that key moves the shuffle to write time, ONCE, and every subsequent
join/aggregation on the key is exchange-free: Spark's scan reports the
hash-partitioning, so the planner emits SortMergeJoin with no Exchange
on either side (asserted by tests/test_bucketing.py).

The reference's analog is output sharding — ``shard % procs`` pinning a
key to a worker (/root/reference/topology.go:341-347) — except bucketing
persists the placement across jobs instead of within one topology run.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from baker_spark.sources.tables import load_table


def bucketize(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    buckets: int = 8,
    suffix: str = "_bkt",
) -> str:
    """Materialize a synthetic table bucketed+sorted by ``key`` into the
    session catalog; returns the catalog table name. Idempotent per
    session (re-registering drops the previous copy)."""
    name = f"{table}{suffix}"
    # the default catalog is in-memory per session but the managed-table
    # location persists on disk; clear both so re-runs are truly idempotent
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), name)
    if os.path.exists(loc):
        shutil.rmtree(loc, ignore_errors=True)
    df = load_table(spark, sf_dir, table)
    (
        df.write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(name)
    )
    return name


def colocated_join(
    spark: SparkSession,
    left: str,
    right: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucket-count catalog tables on their bucket keys.
    With matching bucketing this plans as an exchange-free sort-merge
    join — the plan to check for via ``.explain``: SortMergeJoin present,
    Exchange absent."""
    ldf, rdf = spark.table(left), spark.table(right)
    return ldf.join(rdf, ldf[left_key] == rdf[right_key])
