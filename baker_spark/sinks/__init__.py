from baker_spark.sinks.filewriter import FileWriter  # noqa: F401
from baker_spark.sinks.simple import Nop, OpLog, Recorder  # noqa: F401
from baker_spark.sinks.stats import Stats  # noqa: F401
from baker_spark.sinks.sqlite import SQLiteWriter  # noqa: F401
from baker_spark.sinks.dynamodb import DynamoDBWriter  # noqa: F401
