from baker_spark.streaming.connectors import (
    KINESIS_RECORD_SCHEMA,
    KafkaSource,
    KinesisRecordsSource,
    KinesisSource,
    KinesisStandinSource,
    SocketSource,
    kinesis_records,
)
from baker_spark.streaming.daemon import FileStreamSource, RateSource, StreamingPipeline
from baker_spark.streaming.tcp import TCPFileSource, TCPGzipListener, send_gzip_records
from baker_spark.streaming.sqs import (
    FakeSQSClient,
    SQSConfig,
    SQSFileSource,
    SQSPoller,
    manifest_sink,
)

__all__ = [
    "KINESIS_RECORD_SCHEMA",
    "FakeSQSClient",
    "FileStreamSource",
    "KafkaSource",
    "KinesisRecordsSource",
    "KinesisSource",
    "KinesisStandinSource",
    "kinesis_records",
    "RateSource",
    "SQSConfig",
    "SQSFileSource",
    "SQSPoller",
    "SocketSource",
    "StreamingPipeline",
    "TCPFileSource",
    "TCPGzipListener",
    "manifest_sink",
    "send_gzip_records",
]
