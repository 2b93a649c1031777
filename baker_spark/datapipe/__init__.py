from baker_spark.datapipe import dedup, ingest, multimodal, text, vectors  # noqa: F401
