from baker_spark.streaming.connectors import KafkaSource, KinesisSource, SocketSource
from baker_spark.streaming.daemon import FileStreamSource, RateSource, StreamingPipeline

__all__ = [
    "FileStreamSource",
    "KafkaSource",
    "KinesisSource",
    "RateSource",
    "SocketSource",
    "StreamingPipeline",
]
