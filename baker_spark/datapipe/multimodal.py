"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery (schema, batch iteration, partition sizing) is
real and tested; the actual media decode is STUBBED with a deterministic
fake because no image/audio libraries exist in this environment — swap
``_decode_stub`` for PIL/librosa/pyav in production. Pattern: binary in,
``mapInPandas`` over Arrow batches out, so decode cost scales per
partition and never pulls bytes to the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, head_hex string, width int, height int, format string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Pack a column into binary — stands in for real image/audio bytes."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decoder': derives pseudo width/height from the
    byte length. Replace with a real decoder (PIL.Image.open etc.)."""
    if payload is None:
        return {"n_bytes": 0, "head_hex": "", "width": 0, "height": 0, "format": "none"}
    return {
        "n_bytes": len(payload),
        "head_hex": payload[:8].hex(),
        "width": int(len(payload) % 640),
        "height": int((len(payload) * 7) % 480),
        "format": "fake/v1",
    }


def decode_media(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata batch out."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[payload_col].map(_decode_stub)
            out = pd.DataFrame(list(meta))
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    from baker_spark.session import fan_out

    # decode is per-row expensive: make sure every core gets a partition
    src = fan_out(df.select(id_col, payload_col))
    return src.mapInPandas(decode_batches, DECODE_SCHEMA)


def resize_stub(df: DataFrame, payload_col: str = "payload", max_bytes: int = 1024) -> DataFrame:
    """'Resize' = truncate payload (stands in for image resize / audio
    frame-sample: a binary -> binary pandas UDF over Arrow batches)."""

    @F.pandas_udf("binary")
    def truncate(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else b[:max_bytes])

    return df.withColumn(payload_col, truncate(F.col(payload_col)))
