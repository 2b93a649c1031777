"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (a single JVM); the
defaults below are chosen so the same code runs unchanged on a large
cluster: AQE handles runtime re-planning (partition coalescing, skew
joins), shuffle partitions track parallelism, and zstd is used for
shuffle/ouput compression (the reference ships zstd output too,
/root/reference/output/filewriter.go:26-99).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are safe to (re)apply to an externally provided session.
#: The test-data parquet stores TIMESTAMP(NANOS) which Spark refuses to read
#: unless legacy nanosAsLong is on; DuckDB (the correctness oracle) truncates
#: nanos to micros, so we read nanos as long and truncate identically.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # baker semantics: malformed values become empty/null, never errors
    # (e.g. TimestampRange drops non-integer epochs, timestamp_range.go:92)
    "spark.sql.ansi.enabled": "false",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (e.g. one the
    correctness driver created). Never raises on read-only confs."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def get_spark(app: str = "baker_spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.shuffle.compress", "true")
        .config("spark.io.compression.codec", "zstd")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
