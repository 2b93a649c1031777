from baker_spark.streaming.connectors import KafkaSource, KinesisSource, SocketSource
from baker_spark.streaming.daemon import FileStreamSource, RateSource, StreamingPipeline
from baker_spark.streaming.sqs import (
    FakeSQSClient,
    SQSConfig,
    SQSFileSource,
    SQSPoller,
    manifest_sink,
)

__all__ = [
    "FakeSQSClient",
    "FileStreamSource",
    "KafkaSource",
    "KinesisSource",
    "RateSource",
    "SQSConfig",
    "SQSFileSource",
    "SQSPoller",
    "SocketSource",
    "StreamingPipeline",
    "manifest_sink",
]
