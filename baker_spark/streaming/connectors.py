"""Queue connectors — the format-swap points for the reference's Kinesis,
KCL, SQS and TCP daemon inputs (SURVEY.md §2.1).

The corresponding connector jars (spark-sql-kinesis, spark-sql-kafka)
are not bundled in this environment; each factory builds the exact
reader configuration and fails with a clear error if the format is
unavailable, so topology code stays identical between this sandbox and a
real cluster.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The column layout the spark-sql-kinesis connector emits — one row per
#: Kinesis record. The reference consumes the same record stream through
#: GetRecords and uses only the payload bytes (input/kinesis.go:145-150:
#: `d.Data` may hold MANY newline-separated log lines); partitionKey /
#: sequenceNumber / approximateArrivalTimestamp are per-record metadata
#: the reference discards and Spark exposes.
KINESIS_RECORD_SCHEMA = StructType(
    [
        StructField("data", BinaryType()),
        StructField("streamName", StringType()),
        StructField("partitionKey", StringType()),
        StructField("sequenceNumber", StringType()),
        StructField("approximateArrivalTimestamp", TimestampType()),
    ]
)


def kinesis_records(
    df: DataFrame,
    fields: list[str],
    separator: str = ",",
    arrival_ts: str | None = None,
) -> DataFrame:
    """Connector layout -> record columns, the analog of the reference's
    parse loop over GetRecords payloads (input/kinesis.go:145-150): each
    ``data`` blob is split on newlines (one blob may carry many log
    lines, trailing newline tolerated), then each line is split
    positionally on ``separator`` with baker's no-quoting LogLine rules
    (logline.go:21-31). Works identically on the real ``aws-kinesis``
    stream and on any stand-in emitting :data:`KINESIS_RECORD_SCHEMA` —
    batch or streaming, all JVM-side expressions.

    ``arrival_ts`` optionally carries ``approximateArrivalTimestamp``
    through under that name — the event-time column a watermarked
    aggregation downstream would key on (a capability the reference's
    arrival-order loop lacks)."""
    # explode THEN filter empties: both stay inside whole-stage codegen,
    # where a higher-order array filter would run interpreted in the hot
    # parse path (see PERFORMANCE.md "Codegen vs interpreted")
    lines = F.explode(F.split(F.decode(F.col("data"), "UTF-8"), "\n", -1)).alias("_bk_line")
    keep = [F.col("approximateArrivalTimestamp").alias(arrival_ts)] if arrival_ts else []
    parts = F.split(F.col("_bk_line"), re.escape(separator), -1)
    cols = [F.element_at(parts, i + 1).alias(name) for i, name in enumerate(fields)]
    return (
        df.select(lines, *keep)
        .filter(F.col("_bk_line") != "")
        .select(*cols, *[F.col(c) for c in ([arrival_ts] if arrival_ts else [])])
    )


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
    #: KCL AppName (kcl.go:43): two apps consuming one stream keep
    #: independent positions. The KCL lease/checkpoint table is keyed by
    #: AppName; here the same isolation comes from the checkpoint dir —
    #: derive it with :meth:`checkpoint_dir`.
    app_name: str | None = None

    def checkpoint_dir(self, base: str) -> str:
        """AppName-scoped checkpoint location — the Spark analog of
        KCL's per-app DynamoDB lease table. MaxShards/ShardSync/
        LeaseDuration (kcl.go:44-46) have no knob here: Spark's own
        task scheduling replaces lease balancing."""
        return f"{base.rstrip('/')}/{self.app_name or self.stream_name}"

    def dataframe(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("aws-kinesis")
            .option("kinesis.streamName", self.stream_name)
            .option("kinesis.region", self.region)
            .option("kinesis.startingposition", self.starting_position)
        )
        return _require_format(spark, reader, "aws-kinesis")

    __call__ = dataframe

    def records(
        self, spark: SparkSession, fields: list[str], separator: str = ","
    ) -> DataFrame:
        """The parsed record stream (KINESIS_RECORD_SCHEMA -> fields)."""
        return kinesis_records(self.dataframe(spark), fields, separator)


@dataclass
class KinesisRecordsSource:
    """A connector-layout source (:class:`KinesisSource` or
    :class:`KinesisStandinSource`) composed with :func:`kinesis_records`
    — what a TOML ``[input] name="Kinesis"`` with ``[fields]`` compiles
    to, so the operator chain sees record columns, not raw blobs."""

    inner: object  # anything with .dataframe(spark) -> KINESIS_RECORD_SCHEMA
    fields: list[str]
    separator: str = ","
    arrival_ts: str | None = None

    def dataframe(self, spark: SparkSession) -> DataFrame:
        return kinesis_records(
            self.inner(spark), self.fields, self.separator, self.arrival_ts
        )

    __call__ = dataframe


@dataclass
class KinesisPythonSource:
    """The jar-free Kinesis reader: ``readStream.format("bakerkinesis")``
    (streaming/kinesis_datasource.py — shard -> partition, sequence
    numbers in the checkpoint WAL, boto3 on executors, same
    :data:`KINESIS_RECORD_SCHEMA` out). This is what the TOML compiler
    emits by default, because it is executable code everywhere: real
    AWS via boto3, or the observable ``fake_dir`` spool in tests —
    where :class:`KinesisSource` needs the spark-sql-kinesis jar on the
    classpath."""

    stream_name: str
    region: str = "us-west-2"
    initial_position: str = "LATEST"
    app_name: str | None = None
    fake_dir: str | None = None  # test backdoor: directory-spool client
    max_records_per_trigger: int | None = None
    #: KCL-lease-table analog (kcl.go:27-49): a directory where commit()
    #: journals committed per-shard positions, making restart resume
    #: exact even when the committed backlog exceeds one trigger budget
    #: (without it, a TRIM_HORIZON restart re-probes from 0 and is
    #: at-least-once across the probe window). Point it next to the
    #: query checkpoint dir.
    lease_dir: str | None = None
    #: static shard ownership (MIGRATION.md's multi-job recipe): a
    #: comma-separated shard-id list restricting this reader to a
    #: DISJOINT subset so several daemons split one stream with
    #: deterministic ownership and separate checkpoints — the
    #: Spark-native replacement for KCL's lease rebalancing.
    shard_filter: str | None = None

    def checkpoint_dir(self, base: str) -> str:
        """AppName-scoped checkpoint location (kcl.go:43 isolation)."""
        return f"{base.rstrip('/')}/{self.app_name or self.stream_name}"

    def dataframe(self, spark: SparkSession) -> DataFrame:
        from baker_spark.streaming.kinesis_datasource import register

        register(spark)
        reader = (
            spark.readStream.format("bakerkinesis")
            .option("stream", self.stream_name)
            .option("aws_region", self.region)
            .option("initial_position", self.initial_position)
        )
        if self.fake_dir:
            reader = reader.option("fake_dir", self.fake_dir)
        if self.max_records_per_trigger:
            reader = reader.option(
                "max_records_per_trigger", str(self.max_records_per_trigger)
            )
        if self.lease_dir:
            reader = reader.option("lease_dir", self.lease_dir)
        if self.shard_filter:
            reader = reader.option("shard_filter", self.shard_filter)
        return reader.load()

    __call__ = dataframe

    def records(
        self, spark: SparkSession, fields: list[str], separator: str = ","
    ) -> DataFrame:
        return kinesis_records(self.dataframe(spark), fields, separator)


@dataclass
class KinesisStandinSource:
    """Dev/test stand-in emitting the EXACT ``aws-kinesis`` connector
    layout (:data:`KINESIS_RECORD_SCHEMA`) from the built-in rate
    source, so the :func:`kinesis_records` parse path is exercised
    against the real column contract without the connector jar.

    Each rate row becomes one Kinesis record: ``data`` cycles through
    ``sample_lines`` (a sample may contain embedded newlines — the
    many-log-lines-per-record case the reference handles), partitionKey
    is ``value % shards``, approximateArrivalTimestamp is the rate
    timestamp."""

    sample_lines: list[str] = field(default_factory=lambda: ["0,synthetic,u0"])
    rows_per_second: int = 1000
    shards: int = 4

    def dataframe(self, spark: SparkSession) -> DataFrame:
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rows_per_second)
            .load()
        )
        samples = F.array(*[F.lit(s) for s in self.sample_lines])
        return rate.select(
            F.encode(
                F.element_at(samples, (F.col("value") % len(self.sample_lines) + 1).cast("int")),
                "UTF-8",
            ).alias("data"),
            F.lit("standin-stream").alias("streamName"),
            (F.col("value") % self.shards).cast("string").alias("partitionKey"),
            F.format_string("%021d", F.col("value")).alias("sequenceNumber"),
            F.col("timestamp").alias("approximateArrivalTimestamp"),
        )

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
