"""Structured-file inputs for the TOML surface — JSON-lines and parquet.

The reference only reads newline CSV records (input/list.go); corpus
data mostly arrives as JSONL or parquet, so the topology compiler also
accepts:

    [input]
    name="JsonLines"          # or "Parquet"
    [input.config]
    files=["docs.jsonl.gz"]

Both reuse ListSource's path resolution (@listfile, dirs+MatchPath,
s3->s3a, http spool, stdin) and attach the same url/last-modified
metadata columns. Fields behave like the CSV source: the ``[fields]``
schema picks which top-level keys/columns become record fields (all
StringType for JSONL — baker's everything-is-bytes model, SURVEY.md
§1.2); parquet keeps its native types (it is self-describing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from baker_spark.operators.metadata import LASTMOD_COL, URL_COL
from baker_spark.sources.list_source import ListSource, string_schema


class JsonLinesSource(ListSource):
    def __init__(self, files, fields, match_path=None, attach_metadata=True):
        super().__init__(
            files, fields, separator=",", match_path=match_path, attach_metadata=attach_metadata
        )

    def dataframe(self, spark: SparkSession) -> DataFrame:
        df = (
            spark.read.schema(string_schema(self.fields))
            .option("mode", "PERMISSIVE")
            .json(self.resolve())
        )
        return self._attach_metadata(df)

    __call__ = dataframe


class ParquetSource(ListSource):
    def __init__(self, files, fields=None, match_path=None, attach_metadata=True):
        super().__init__(
            files, fields or [], separator=",", match_path=match_path, attach_metadata=attach_metadata
        )

    def dataframe(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(*self.resolve())
        if self.fields:
            df = df.select(*self.fields)
        return self._attach_metadata(df)

    __call__ = dataframe
