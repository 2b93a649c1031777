"""FileWriter — serialized records to compressed CSV files
(/root/reference/output/filewriter.go:26-99).

Reference capabilities -> Spark disposition:

- path template ``{{.Year}}/{{.Month}}/.../{{.Index}}{{.UUID}}`` -> an
  output directory; Spark names task files itself (UUID ≈ task attempt id)
- ``{{.Field0}}`` worker fan-out -> ``partitionBy(field)`` directory layout
- gzip/zstd -> ``option("compression", ...)``
- time/size rotation (filewriter.go:270-372) -> ``maxRecordsPerFile`` for
  batch; streaming rotation is the trigger interval (baker_spark.streaming)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class FileWriter:
    path: str
    # the reference defaults to zstd (filewriter.go:26-99); Spark's CSV
    # writer has no zstd codec in this build, so gzip is the default here
    compression: str = "gzip"
    separator: str = ","
    partition_by: str | None = None  # ≈ {{.Field0}} fan-out
    max_records_per_file: int | None = None  # ≈ RotateSize
    mode: str = "overwrite"

    def write(self, df: DataFrame) -> str:
        writer = (
            df.write.mode(self.mode)
            .option("compression", self.compression)
            .option("sep", self.separator)
            .option("quote", "")
            .option("emptyValue", "")
        )
        if self.max_records_per_file:
            writer = writer.option("maxRecordsPerFile", self.max_records_per_file)
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        writer.csv(self.path)
        return self.path
