"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference OCRs images via a Tesseract subprocess (app/extractors.py:
1386-1519) and fences it with size/mode validation (app/utils.py:639-682).
In the Spark engine, media are ``binary`` columns with typed metadata; the
*plumbing* — schema, Arrow batch shape, partitioning, validation gates —
is real and tested, while codec work (decode/resize/frame-sample) is
stubbed behind ``DecoderUnavailable`` because no image/audio libs ship in
this environment. Swap ``_decode_stub`` for a PIL/ffmpeg call and the
pipeline is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MAX_PIXELS = 50_000_000  # app/utils.py:660 (50 MP OCR gate)

MEDIA_SCHEMA = StructType([
    StructField("media_ref", StringType(), False),
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_ref", StringType(), False),
    StructField("status", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sniffed_mime", StringType()),
    StructField("feature_hash", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", LongType()),
])

# Magic-byte prefix table (the reference's soft sniff,
# app/extractors.py:1521-1573 — prefix signatures only).
_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
]


class DecoderUnavailable(NotImplementedError):
    """Raised by codec stubs; replace with a real decoder in production."""


def _decode_stub(payload: bytes, mime: str):  # pragma: no cover - stub
    raise DecoderUnavailable(
        f"no codec for {mime} in this environment; plug PIL/ffmpeg here"
    )


def sniff_mime(payload: bytes | None) -> str | None:
    if not payload:
        return None
    if payload.startswith(b"RIFF") and len(payload) >= 12:
        kind = payload[8:12]
        if kind == b"WAVE":
            return "audio/wav"
        if kind == b"WEBP":
            return "image/webp"
        return "application/octet-stream"
    for sig, mime in _MAGIC:
        if payload.startswith(sig):
            return mime
    return "application/octet-stream"


def decode_bmp_header(payload: bytes) -> dict | None:
    """Uncompressed-BMP header decode (pure struct, no codec): BITMAPFILE-
    HEADER 'BM' + BITMAPINFOHEADER width/height at offsets 18/22 (LE i32;
    negative height = top-down rows)."""
    import struct
    if len(payload) < 26 or not payload.startswith(b"BM"):
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    if width <= 0 or height == 0:
        return None
    return {"width": width, "height": abs(height)}


def decode_png_header(payload: bytes) -> dict | None:
    """PNG IHDR decode (pure struct): the first chunk after the 8-byte
    signature is always IHDR (PNG spec §11.2.2) — width/height are the
    two big-endian u32s at offsets 16/20. Lets the reference's OCR pixel
    gates (app/utils.py:639-682: 150x150 min, 50 MP cap) run on real
    dimensions for the most common web image format."""
    import struct
    if len(payload) < 24 or not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    if payload[12:16] != b"IHDR":
        return None
    width, height = struct.unpack_from(">II", payload, 16)
    if width == 0 or height == 0:
        return None
    return {"width": width, "height": height}


def decode_gif_header(payload: bytes) -> dict | None:
    """GIF Logical Screen Descriptor decode: canvas width/height are the
    two little-endian u16s straight after the 6-byte version signature
    (GIF89a spec §18)."""
    import struct
    if len(payload) < 10 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack_from("<HH", payload, 6)
    if width == 0 or height == 0:
        return None
    return {"width": width, "height": height}


def decode_wav_header(payload: bytes) -> dict | None:
    """RIFF/WAVE chunk walk: fmt chunk -> channels/sample_rate/byte_rate,
    data chunk size -> duration_ms = data_bytes * 1000 / byte_rate."""
    import struct
    if (len(payload) < 44 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        return None
    pos, rate, byte_rate, data_size = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt " and pos + 24 <= len(payload):
            _fmt, _ch, rate, byte_rate = struct.unpack_from(
                "<HHII", payload, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if not rate or not byte_rate or data_size is None:
        return None
    return {"sample_rate": rate,
            "duration_ms": data_size * 1000 // byte_rate}


def validate_media_df(df: DataFrame) -> DataFrame:
    """Column-level gates mirroring app/utils.py:639-682: pixel cap and
    non-empty payload; quarantine rows get valid=false."""
    return df.withColumn(
        "valid",
        F.col("payload").isNotNull()
        & (F.coalesce(F.col("width") * F.col("height"), F.lit(0)) <= MAX_PIXELS),
    )


def _feature_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import hashlib

    import pandas as pd

    for batch in batches:
        rows = []
        for ref, payload, mime in zip(batch["media_ref"], batch["payload"],
                                      batch["mime"]):
            payload = bytes(payload) if payload is not None else b""
            sniffed = sniff_mime(payload)
            width = height = rate = duration = None
            # Header formats with stdlib-decodable metadata are decoded for
            # real; compressed codecs stay behind the stub seam.
            hdr = (decode_bmp_header(payload) if sniffed == "image/bmp"
                   else decode_png_header(payload)
                   if sniffed == "image/png"
                   else decode_gif_header(payload)
                   if sniffed == "image/gif"
                   else decode_wav_header(payload)
                   if sniffed == "audio/wav" else None)
            if hdr is not None:
                status = "decoded"
                width, height = hdr.get("width"), hdr.get("height")
                rate, duration = hdr.get("sample_rate"), hdr.get("duration_ms")
            else:
                try:
                    _decode_stub(payload, mime)
                    status = "decoded"
                except DecoderUnavailable:
                    status = "stubbed"
            # Deterministic "feature": content hash stands in for the real
            # embedding/thumbnail so downstream plumbing is exercised.
            rows.append((ref, status, len(payload), sniffed,
                         hashlib.md5(payload).hexdigest(),
                         width, height, rate, duration))
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def extract_media_features(df: DataFrame,
                           partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary media rows.

    Real pipeline shape: validate -> salt-repartition (media payloads are
    the skew magnets) -> mapInPandas decode/feature kernel.
    """
    valid = validate_media_df(df).filter("valid")
    if partitions:
        valid = valid.repartition(partitions, F.pmod(F.xxhash64("media_ref"),
                                                     F.lit(partitions)))
    return valid.select("media_ref", "payload", "mime").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )
