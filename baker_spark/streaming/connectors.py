"""Queue connectors — the format-swap points for the reference's Kinesis,
KCL, SQS and TCP daemon inputs (SURVEY.md §2.1).

The corresponding connector jars (spark-sql-kinesis, spark-sql-kafka)
are not bundled in this environment; each factory builds the exact
reader configuration and fails with a clear error if the format is
unavailable, so topology code stays identical between this sandbox and a
real cluster.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _require_format(spark: SparkSession, reader, fmt: str) -> DataFrame:
    try:
        return reader.load()
    except Exception as e:
        raise RuntimeError(
            f"streaming format {fmt!r} is not on the classpath; add the "
            f"connector jar (e.g. --packages) to use this source"
        ) from e


@dataclass
class KinesisSource:
    """Kinesis tail (input/kinesis.go:20-26: all shards from LATEST).
    Structured Streaming's checkpointing replaces KCL's DynamoDB lease
    table (input/kcl.go:27-49) — resume position comes from the query's
    checkpoint dir, not a sidecar table."""

    stream_name: str
    region: str = "us-west-2"
    starting_position: str = "LATEST"  # or TRIM_HORIZON (kcl.go InitialPosition)

    def dataframe(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("aws-kinesis")
            .option("kinesis.streamName", self.stream_name)
            .option("kinesis.region", self.region)
            .option("kinesis.startingposition", self.starting_position)
        )
        return _require_format(spark, reader, "aws-kinesis")

    __call__ = dataframe


@dataclass
class KafkaSource:
    """Kafka — the conventional stand-in for Kinesis in OSS deployments
    (SURVEY.md §2.1 suggests it for tests)."""

    bootstrap_servers: str
    topics: str
    starting_offsets: str = "latest"

    def dataframe(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topics)
            .option("startingOffsets", self.starting_offsets)
        )
        return _require_format(spark, reader, "kafka")

    __call__ = dataframe


@dataclass
class SocketSource:
    """TCP line source (dev-only, like the reference's :6000 listener,
    input/tcp.go:20-28 — minus the nonstandard gzip framing)."""

    host: str = "localhost"
    port: int = 6000

    def dataframe(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("socket")
            .option("host", self.host)
            .option("port", self.port)
        )
        return _require_format(spark, reader, "socket")

    __call__ = dataframe
