"""baker_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of AdRoll/baker (reference: /root/reference),
re-expressed Spark-first.

The reference is a TOML-configured record-at-a-time ETL pipeline
(input -> filter chain -> output -> upload) over flat string records
(/root/reference/topology.go:16-52). Here the same capabilities are
declared as DataFrame lineage and optimized by Catalyst:

- ``baker_spark.session``   — SparkSession factory with scale-aware defaults
- ``baker_spark.sources``   — inputs (file lists, test tables, parquet loader)
- ``baker_spark.operators`` — the row-operator inventory (SURVEY.md §2.2)
- ``baker_spark.sinks``     — outputs (file writer, stats, sqlite, dynamodb, noop)
- ``baker_spark.plans``     — TOML topology compiler -> Pipeline
- ``baker_spark.streaming`` — daemon-mode (Structured Streaming) wiring
- ``baker_spark.datapipe``  — LLM-training-data extensions (dedup, similarity,
                              text analysis, multimodal plumbing)
"""

from baker_spark.session import get_spark  # noqa: F401
from baker_spark.pipeline import Pipeline  # noqa: F401

__version__ = "0.1.0"
