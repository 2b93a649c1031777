from baker_spark.datapipe import dedup, multimodal, text, vectors  # noqa: F401
