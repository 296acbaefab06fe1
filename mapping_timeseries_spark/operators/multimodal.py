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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary_payload",
    "attach_image_payload",
    "attach_video_payload",
    "synth_wav",
    "parse_wav",
    "synth_bmp",
    "parse_bmp",
    "resize_bmp",
    "resize_images",
    "synth_avi",
    "parse_avi",
    "sample_video_frames",
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
    # numpy over the raw buffer: exact int64 arithmetic (n<=256 samples,
    # |s|<2^15 -> sumsq < 2^38), ~20x the python loop across a batch
    samples = np.frombuffer(data[: 2 * n], dtype="<i2").astype(np.int64)
    return {
        "n_samples": n,
        "sample_rate": sample_rate,
        "pcm_sum": int(samples.sum()) if n else 0,
        "pcm_sumsq": int((samples * samples).sum()) if n else 0,
        "pcm_min": int(samples.min()) if n else None,
        "pcm_max": int(samples.max()) if n else None,
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
    # drop per-row padding columns, then one vectorized channel sum
    px = (
        np.frombuffer(payload, dtype=np.uint8,
                      count=stride * height, offset=data_offset)
        .reshape(height, stride)[:, : width * 3]
        .reshape(-1, 3)
        .astype(np.int64)
    )
    sum_b, sum_g, sum_r = (int(s) for s in px.sum(axis=0))
    return {
        "width": width,
        "height": height,
        "n_px": width * height,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


def resize_bmp(payload: bytes, factor: int = 2) -> bytes:
    """Nearest-neighbor downscale of a 24-bit BMP by an integer factor —
    the resize stage of an image-preprocessing pipeline, pure stdlib.

    Picks pixel (y*factor, x*factor) of the source for output (y, x) and
    re-emits a valid padded bottom-up BMP, so the result round-trips
    through :func:`parse_bmp`. Output dims are ``ceil(dim/factor)``
    (every source pixel within reach of the grid is representable).
    """
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    src = parse_bmp(payload)  # validates container
    w, h = src["width"], src["height"]
    (_fs, _r1, _r2, data_offset) = struct.unpack_from("<IHHI", payload, 2)
    stride = w * 3 + (4 - (w * 3) % 4) % 4
    ow = -(-w // factor)
    oh = -(-h // factor)
    orow = ow * 3
    opad = (4 - orow % 4) % 4

    def src_px(x: int, y: int) -> bytes:
        off = data_offset + (h - 1 - y) * stride + 3 * x
        return payload[off : off + 3]

    rows = []
    for oy in range(oh - 1, -1, -1):  # bottom-up output
        rows.append(
            b"".join(src_px(ox * factor, oy * factor) for ox in range(ow))
            + b"\x00" * opad
        )
    data = b"".join(rows)
    file_header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, ow, oh, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


#: video fixture geometry: small frames, multiple of nothing special
AVI_WIDTH = 8
AVI_HEIGHT = 6
AVI_FRAMES = 8
AVI_FPS = 4


def synth_avi(doc_id: int, text: str, n_frames: int = AVI_FRAMES,
              width: int = AVI_WIDTH, height: int = AVI_HEIGHT) -> bytes:
    """Deterministic uncompressed AVI (RIFF 'AVI ') with ``n_frames``
    raw 24-bit BGR bottom-up frames — the video-modality fixture.

    Frame ``f``, logical pixel ``k`` (row-major from top) has channels
    ``b=(cp*3+k*11+f*19+doc_id)%256, g=(cp*5+k*13+f*23)%256,
    r=(cp*7+k*17+f*29)%256`` where ``cp`` is the code point of
    ``text[(f + k) % len(text)]`` (97 for empty text) — a pure function
    of (doc_id, text) so expected per-frame stats are SQL-computable.

    Container layout (all real, chunk-walked by :func:`parse_avi`):
    RIFF('AVI ') { LIST('hdrl'){ avih, LIST('strl'){ strh, strf } },
    LIST('movi'){ '00db' * n_frames } }.
    """
    n = len(text)
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    frame_size = (row_bytes + pad) * height

    def frame(f: int) -> bytes:
        rows = []
        for y in range(height - 1, -1, -1):
            row = bytearray()
            for x in range(width):
                k = y * width + x
                cp = ord(text[(f + k) % n]) if n else 97
                row += bytes(
                    (
                        (cp * 3 + k * 11 + f * 19 + int(doc_id)) % 256,
                        (cp * 5 + k * 13 + f * 23) % 256,
                        (cp * 7 + k * 17 + f * 29) % 256,
                    )
                )
            rows.append(bytes(row) + b"\x00" * pad)
        return b"".join(rows)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1000000 // AVI_FPS,          # microseconds per frame
        frame_size * AVI_FPS,        # max bytes per second
        0, 0x10,                     # padding, flags (AVIF_HASINDEX off)
        n_frames, 0, 1, frame_size,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        AVI_FPS, 0, n_frames, frame_size,
                                        0xFFFFFFFF, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", frame(f)) for f in range(n_frames)))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Chunk-walk a RIFF/AVI container: validate magics and sizes, read
    dims/frame count from ``avih``, collect the '00db' frame bodies.
    Shared by :func:`parse_avi` and :func:`sample_video_frames`."""
    if payload is None or len(payload) < 12:
        raise ValueError("not a RIFF container: too short")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size mismatch")

    avih = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal avih
        off = start
        while off + 8 <= end:
            cid = payload[off : off + 4]
            (csize,) = struct.unpack_from("<I", payload, off + 4)
            body_start = off + 8
            if body_start + csize > end:
                raise ValueError("chunk truncated")
            if cid == b"LIST":
                walk(body_start + 4, body_start + csize)
            elif cid == b"avih":
                if csize < 56:
                    raise ValueError("avih truncated")
                avih = struct.unpack_from("<IIIIIIIIIIIIII", payload, body_start)
            elif cid == b"00db":
                frames.append(payload[body_start : body_start + csize])
            off = body_start + csize + (csize & 1)

    walk(12, len(payload))
    if avih is None:
        raise ValueError("missing avih header")
    n_frames, width, height = avih[4], avih[8], avih[9]
    if len(frames) != n_frames:
        raise ValueError(f"frame count mismatch: avih={n_frames} movi={len(frames)}")
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    for frame in frames:
        if len(frame) != stride * height:
            raise ValueError("frame size mismatch")
    return width, height, frames


def _frame_channel_sums(frame: bytes, width: int, height: int) -> tuple[int, int, int]:
    """Vectorized (sum_b, sum_g, sum_r) over one padded raw BGR frame."""
    stride = width * 3 + (4 - (width * 3) % 4) % 4
    px = (
        np.frombuffer(frame, dtype=np.uint8)
        .reshape(height, stride)[:, : width * 3]
        .reshape(-1, 3)
        .astype(np.int64)
    )
    b, g, r = (int(s) for s in px.sum(axis=0))
    return b, g, r


def parse_avi(payload: bytes, frame_stride: int = 1) -> dict:
    """Real AVI parser with frame sampling: walk the RIFF tree, decode
    every ``frame_stride``-th frame's padded rows, return integer-exact
    channel sums over the SAMPLED frames. Raises ``ValueError`` on
    malformed input."""
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    width, height, frames = _avi_frames(payload)
    sampled = list(range(0, len(frames), frame_stride))
    sum_b = sum_g = sum_r = 0
    for f in sampled:
        b, g, r = _frame_channel_sums(frames[f], width, height)
        sum_b += b
        sum_g += g
        sum_r += r
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "n_sampled": len(sampled),
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


def attach_video_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Video-modality twin: real uncompressed AVI containers as the
    binary column, same metadata contract."""

    @F.pandas_udf(_PAYLOAD_SCHEMA)
    def synth(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_avi(d, t) for d, t in zip(doc_id, text)], dtype=object
        )

    payload = synth(F.col("doc_id"), F.col(text_col))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("video/avi").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Payload→payload image transform: nearest-neighbor downscale of
    every BMP payload by ``factor``, metadata struct updated to the new
    byte length. Map-only mapInPandas — the shape of any re-encode /
    thumbnail stage (bytes cross into Python once per Arrow batch)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("mime", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    flat = media.select(
        "doc_id", "payload",
        F.col("meta.mime").alias("mime"), F.col("meta.lang").alias("lang"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [resize_bmp(p, factor) for p in pdf["payload"]]
            yield pdf

    resized = flat.mapInPandas(run, out_schema)
    payload = F.col("payload")
    return resized.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.col("mime").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def sample_video_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: one OUTPUT ROW per sampled frame (every
    ``stride``-th) of each video payload — the batch-shape-changing
    mapInPandas (1 video row → n_frames/stride frame rows) a
    frame-extraction stage uses. Per-frame integer channel sums."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    flat = media.select("doc_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                width, height, frames = _avi_frames(payload)
                for f in range(0, len(frames), stride):
                    sum_b, sum_g, sum_r = _frame_channel_sums(
                        frames[f], width, height
                    )
                    rows.append(
                        (int(doc_id), f, width, height, sum_r, sum_g, sum_b)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FRAME_SCHEMA.fields]
            )

    return flat.mapInPandas(run, _FRAME_SCHEMA)
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
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_DECODERS = {
    "audio/wav": parse_wav,
    "image/bmp": parse_bmp,
    "video/avi": parse_avi,
}


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

    # pandas puts a missing key (e.g. `width` on an audio row) as NaN in
    # a float64 column; Arrow must then unsafely down-cast float64 ->
    # int32/int64 to meet the schema, which raises outright on sessions
    # running spark.sql.execution.pandas.convertToArrowArraySafely=true.
    # Coercing to pandas NULLABLE integer dtypes makes the missing
    # values genuine nulls and the conversion exact on any session conf.
    _nullable_dtype = {
        T.IntegerType(): "Int32",
        T.LongType(): "Int64",
    }
    feature_dtypes = {
        f.name: _nullable_dtype[f.dataType]
        for f in _FEATURE_SCHEMA.fields
        if f.name in feature_cols and f.dataType in _nullable_dtype
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pd.DataFrame(
                [decode(m, p) for m, p in zip(pdf["mime"], pdf["payload"])],
                columns=feature_cols,
            ).astype(feature_dtypes)
            out = pd.concat(
                [pdf[["doc_id", "mime", "lang", "n_bytes"]].reset_index(drop=True), feats],
                axis=1,
            )
            yield out[[f.name for f in _FEATURE_SCHEMA.fields]]

    return flat.mapInPandas(run, _FEATURE_SCHEMA)
