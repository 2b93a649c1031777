"""Trivial sinks: Nop (count + discard, /root/reference/output/nop.go),
OpLog (log records, /root/reference/output/oplog.go), Recorder (in-memory
test sink, /root/reference/output/outputtest/recorder.go)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Nop:
    """Consume and count — Spark ships a real 'noop' write format."""

    count: int = 0

    def write(self, df: DataFrame) -> int:
        self.count = df.count()
        df.write.format("noop").mode("overwrite").save()
        return self.count


@dataclass
class OpLog:
    """Print each record to stdout (dev tool)."""

    num_rows: int = 20

    def write(self, df: DataFrame) -> None:
        df.show(self.num_rows, truncate=False)


@dataclass
class Recorder:
    """Collect records in memory for assertions (test sink)."""

    records: list = field(default_factory=list)

    def write(self, df: DataFrame) -> list:
        self.records = df.collect()
        return self.records
