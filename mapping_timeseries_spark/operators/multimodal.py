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
    "attach_image_payload",
    "synth_wav",
    "parse_wav",
    "synth_bmp",
    "parse_bmp",
    "extract_features",
]

SAMPLE_RATE = 8000
MAX_SAMPLES = 256

#: BMP width 15 on purpose: 15 px * 3 B = 45 B/row, forcing the 3-byte
#: row padding the format requires (a width-16 fixture would hide
#: padding bugs entirely — 48 B rows are already 4-aligned).
BMP_WIDTH = 15
MAX_PIXELS = 256


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


def synth_bmp(doc_id: int, text: str, width: int = BMP_WIDTH,
              max_pixels: int = MAX_PIXELS) -> bytes:
    """Deterministic 24-bit bottom-up BMP synthesized from document
    content — the image-modality twin of :func:`synth_wav`.

    Logical pixel ``k`` (row-major from the top) for ``k < n`` where
    ``n = min(len(text), max_pixels)`` has channels
    ``b=(cp*3+k*11+doc_id)%256, g=(cp*5+k*13)%256, r=(cp*7+k*17)%256``
    with ``cp = ord(text[k])``; pixels past ``n`` are black. Pure
    function of (doc_id, text), so expected channel sums are
    SQL-computable without binary parsing.
    """
    n = min(len(text), max_pixels)
    height = max(1, -(-n // width))
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4

    def px(k: int) -> bytes:
        if k >= n:
            return b"\x00\x00\x00"
        cp = ord(text[k])
        return bytes(
            (
                (cp * 3 + k * 11 + int(doc_id)) % 256,
                (cp * 5 + k * 13) % 256,
                (cp * 7 + k * 17) % 256,
            )
        )

    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        rows.append(
            b"".join(px(y * width + x) for x in range(width)) + b"\x00" * pad
        )
    data = b"".join(rows)
    image_size = (row_bytes + pad) * height
    file_header = b"BM" + struct.pack("<IHHI", 54 + image_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size,
        2835, 2835, 0, 0,
    )
    return file_header + info_header + data


def parse_bmp(payload: bytes) -> dict:
    """Real BMP parser: validate the BITMAPFILEHEADER/BITMAPINFOHEADER,
    walk the bottom-up padded pixel rows, and return integer-exact
    channel statistics. Raises ``ValueError`` on malformed input —
    decode failures must surface, not pass as zeros."""
    if payload is None or len(payload) < 54:
        raise ValueError("not a BMP: too short")
    if payload[0:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    file_size, _r1, _r2, data_offset = struct.unpack_from("<IHHI", payload, 2)
    if file_size != len(payload):
        raise ValueError("BMP size mismatch")
    (hdr_size, width, height, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: hdr={hdr_size} planes={planes} bpp={bpp} "
            f"comp={compression}"
        )
    if width <= 0 or height <= 0:
        raise ValueError(f"unsupported BMP dims: {width}x{height}")
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if data_offset + stride * height > len(payload):
        raise ValueError("pixel data truncated")
    sum_b = sum_g = sum_r = 0
    for row in range(height):
        off = data_offset + row * stride  # storage order; sums are order-free
        for x in range(width):
            b, g, r = payload[off + 3 * x : off + 3 * x + 3]
            sum_b += b
            sum_g += g
            sum_r += r
    return {
        "width": width,
        "height": height,
        "n_px": width * height,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
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


def attach_image_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Image-modality twin of :func:`attach_binary_payload`: real BMP
    containers as the binary column, same metadata contract."""

    @F.pandas_udf(_PAYLOAD_SCHEMA)
    def synth(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_bmp(d, t) for d, t in zip(doc_id, text)], dtype=object
        )

    payload = synth(F.col("doc_id"), F.col(text_col))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


#: One row per media object regardless of modality: audio columns are
#: null on image rows and vice versa (a union schema, not two tables —
#: the downstream table contract of a mixed-modality corpus).
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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_px", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)

_DECODERS = {"audio/wav": parse_wav, "image/bmp": parse_bmp}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads, dispatched
    per row on the metadata mime type (audio -> WAV parser, image ->
    BMP parser).

    mapInPandas over (doc_id, payload, meta) — the exact shape a real
    decode/resize/frame-sample stage uses. Metadata rides through the map
    (no join to reunite), and the per-batch loop is the only Python. An
    unknown mime raises (quarantine upstream, don't silently zero).
    """
    flat = media.select(
        "doc_id",
        "payload",
        F.col("meta.mime").alias("mime"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    feature_cols = [
        f.name
        for f in _FEATURE_SCHEMA.fields
        if f.name not in ("doc_id", "mime", "lang", "n_bytes")
    ]

    def decode(mime: str, payload: bytes) -> dict:
        try:
            dec = _DECODERS[mime]
        except KeyError:
            raise ValueError(f"no decoder for mime {mime!r}") from None
        return dec(payload)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame(
                [decode(m, p) for m, p in zip(pdf["mime"], pdf["payload"])],
                columns=feature_cols,
            )
            out = pd.concat(
                [pdf[["doc_id", "mime", "lang", "n_bytes"]].reset_index(drop=True), feats],
                axis=1,
            )
            yield out[[f.name for f in _FEATURE_SCHEMA.fields]]

    return flat.mapInPandas(run, _FEATURE_SCHEMA)
