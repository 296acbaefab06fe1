"""Multimodal column plumbing (SURVEY §2.11): opaque binary payloads with
typed metadata, decoded/feature-extracted through Arrow-batched Python.

The container has no image/audio codecs, so the decode step is a STUB
(deterministic fake features behind ``decode_stub``; a real deployment
swaps in PIL/ffmpeg inside the same ``mapInPandas`` shape). Everything
around the stub — schema, binary columns, batch iteration, partitioning —
is real and tested.

Scale notes
-----------
Binary payloads ride as parquet BYTE_ARRAY; mapInPandas streams Arrow
record batches so a partition never fully materializes in Python memory
beyond one batch (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds
it). Feature extraction is embarrassingly parallel — no shuffle at all;
plan shows scan -> MapInPandas -> project.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["attach_binary_payload", "decode_stub", "extract_features"]


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: binary payload + typed metadata struct.

    Uses utf-8 text bytes as the stand-in payload (the fixture has no real
    media); the schema — binary column, mime/meta struct — is the real
    contract.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake "decoder": real codecs are unavailable in this
    environment. Returns stable pseudo-features derived from the bytes.

    Swap for a real decoder (PIL image open, soundfile read, ...) keeping
    the signature: bytes -> feature dict.
    """
    if payload is None:
        raise NotImplementedError(
            "decode of null payload: real decoder not available in this build"
        )
    head = payload[:8]
    return {
        "n_bytes": len(payload),
        "head_sum": int(sum(head)),
        "byte_mean": float(sum(payload) / len(payload)) if payload else 0.0,
    }


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("head_sum", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas over (doc_id, payload) — the exact shape a real
    decode/resize/frame-sample stage uses; per-batch loop is the only
    Python, and the stub is the only fake part.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return media.select("doc_id", "payload").mapInPandas(run, _FEATURE_SCHEMA)
