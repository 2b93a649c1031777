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
    src = fan_out(df.select(id_col, payload_col), by=id_col)
    return src.mapInPandas(decode_batches, DECODE_SCHEMA)


def resize_stub(df: DataFrame, payload_col: str = "payload", max_bytes: int = 1024) -> DataFrame:
    """'Resize' = truncate payload (stands in for image resize / audio
    frame-sample: a binary -> binary pandas UDF over Arrow batches)."""

    @F.pandas_udf("binary")
    def truncate(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else b[:max_bytes])

    return df.withColumn(payload_col, truncate(F.col(payload_col)))


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    every: int = 4,
) -> DataFrame:
    """Video frame sampling plumbing: binary payload -> every Nth
    fixed-size window as its own row (posexplode keeps the frame index).
    The stub 'decoder' slices byte windows; a real one yields encoded
    frames via pyav. Row explosion happens JVM-side after the pandas UDF
    returns array<binary>, so batch shape stays Arrow-friendly."""

    @F.pandas_udf("array<binary>")
    def frames(s: pd.Series) -> pd.Series:
        def cut(b):
            if b is None:
                return []
            all_frames = [b[i : i + frame_bytes] for i in range(0, len(b), frame_bytes)]
            return all_frames[::every]

        return s.map(cut)

    from baker_spark.session import fan_out

    src = fan_out(df.select(id_col, payload_col), by=id_col)
    return src.select(
        F.col(id_col), F.posexplode(frames(F.col(payload_col))).alias("frame_idx", "frame")
    )


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", dim: int = 8
) -> DataFrame:
    """Feature extraction plumbing: binary payload -> fixed-dim
    array<float>. Stub derives features from byte sums over stripes (a
    real extractor runs a vision/audio model per Arrow batch); output
    column is directly consumable by datapipe.vectors (cosine / LSH /
    IVF)."""

    @F.pandas_udf("array<float>")
    def feats(s: pd.Series) -> pd.Series:
        def vec(b):
            if b is None:
                return [0.0] * dim
            return [float(sum(b[j::dim]) % 997) for j in range(dim)]

        return s.map(vec)

    from baker_spark.session import fan_out

    src = fan_out(df.select(id_col, payload_col), by=id_col)
    return src.select(F.col(id_col), feats(F.col(payload_col)).alias("features"))
