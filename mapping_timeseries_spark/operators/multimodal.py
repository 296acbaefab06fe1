"""Multimodal column plumbing (SURVEY §2.11): opaque binary payloads with
typed metadata, decoded/feature-extracted through Arrow-batched Python.

The payloads are real RIFF/WAVE containers (44-byte canonical header +
16-bit mono PCM) synthesized deterministically from the document corpus,
and the decoder is a real chunk-walking WAV parser (`parse_wav`) — pure
stdlib `struct`, no codec libraries. A production deployment swaps the
synthesizer for actual media and extends `parse_wav` with PIL/ffmpeg
inside the same ``mapInPandas`` shape; everything around the decode —
binary columns, typed metadata struct, Arrow batch iteration,
partitioning — is identical.

Reference analogue: the engine's UDF decode boundary
(``mapping_engine.py:241-296``); north-star multimodal columns.

Scale notes
-----------
Binary payloads ride as parquet BYTE_ARRAY; mapInPandas streams Arrow
record batches so a partition never fully materializes in Python memory
beyond one batch (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds
it). Feature extraction is embarrassingly parallel — no shuffle at all;
plan shows scan -> MapInPandas -> project. Metadata columns pass through
the same map so no join is needed to reunite features with metadata.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary_payload",
    "synth_wav",
    "parse_wav",
    "extract_features",
]

SAMPLE_RATE = 8000
MAX_SAMPLES = 256


def synth_wav(doc_id: int, text: str, max_samples: int = MAX_SAMPLES,
              sample_rate: int = SAMPLE_RATE) -> bytes:
    """Deterministic 16-bit mono PCM WAV synthesized from document content.

    Sample ``i`` is ``((cp*257 + i*7919 + doc_id*31) % 65536) - 32768``
    where ``cp`` is the code point of character ``i`` — a pure function of
    (doc_id, text) so an independent engine can compute the expected
    decoded statistics without parsing binary.
    """
    cps = [ord(c) for c in text[:max_samples]]
    samples = [
        ((cp * 257 + i * 7919 + int(doc_id) * 31) % 65536) - 32768
        for i, cp in enumerate(cps)
    ]
    data = b"".join(struct.pack("<h", s) for s in samples)
    n_bytes = len(data)
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + n_bytes)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n_bytes)
    )
    return header + data


def parse_wav(payload: bytes) -> dict:
    """Real RIFF/WAVE parser: validate magics, walk chunks to ``fmt `` and
    ``data``, then compute exact integer PCM statistics.

    Returns integer-exact features (sums, not means) so results are
    bit-portable across engines. Raises ``ValueError`` on a malformed
    container — a decode failure must surface, not pass as zeros.
    """
    if payload is None or len(payload) < 12:
        raise ValueError("not a RIFF container: too short")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")

    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (csize,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + csize]
        if cid == b"fmt ":
            # a declared size smaller than the fmt struct must surface as
            # the documented ValueError, not a raw struct.error — callers
            # quarantine bad payloads by catching ValueError per record
            if len(body) < 16:
                raise ValueError(f"fmt chunk truncated: {len(body)} < 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(f"unsupported encoding: fmt={audio_format} ch={channels} bits={bits}")

    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: 2 * n]) if n else ()
    return {
        "n_samples": n,
        "sample_rate": sample_rate,
        "pcm_sum": sum(samples),
        "pcm_sumsq": sum(s * s for s in samples),
        "pcm_min": min(samples) if n else None,
        "pcm_max": max(samples) if n else None,
    }


_PAYLOAD_SCHEMA = T.BinaryType()


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: binary payload + typed metadata struct.

    The payload is a real WAV container synthesized from the document
    (Arrow-batched pandas UDF — the synthesizer stands in for reading
    actual media files); the schema — binary column, mime/meta struct —
    is the production contract.
    """

    @F.pandas_udf(_PAYLOAD_SCHEMA)
    def synth(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_wav(d, t) for d, t in zip(doc_id, text)], dtype=object
        )

    payload = synth(F.col("doc_id"), F.col(text_col))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("pcm_sum", T.LongType()),
        T.StructField("pcm_sumsq", T.LongType()),
        T.StructField("pcm_min", T.IntegerType()),
        T.StructField("pcm_max", T.IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas over (doc_id, payload, meta) — the exact shape a real
    decode/resize/frame-sample stage uses. Metadata rides through the map
    (no join to reunite), and the per-batch loop is the only Python.
    """
    flat = media.select(
        "doc_id",
        "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame([parse_wav(p) for p in pdf["payload"]])
            out = pd.concat(
                [pdf[["doc_id", "mime", "lang", "n_bytes"]].reset_index(drop=True), feats],
                axis=1,
            )
            yield out[[f.name for f in _FEATURE_SCHEMA.fields]]

    return flat.mapInPandas(run, _FEATURE_SCHEMA)
