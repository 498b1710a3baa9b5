"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``binary`` columns with a struct
of metadata, exactly like ``html`` in the CDC path.  The decode /
feature-extract steps are Pandas-UDF-backed ``mapInPandas`` stages with
real schemas, batching, and partitioning; the codec itself is STUBBED
(this container has no image/audio libraries) behind
``set_decoder`` — a deterministic fake decoder is installed by default
so the plumbing is fully testable.

Production swap-in: ``set_decoder("image", pillow_decode)`` where
pillow_decode(payload: bytes) -> dict — nothing else changes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta struct<width:int, "
    "height:int, duration_ms:int, mime:string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, checksum long, "
    "width int, height int, feature array<float>"
)

_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def set_decoder(kind: str, fn: Callable[[bytes], dict]) -> None:
    _DECODERS[kind] = fn


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec.

    Emits plausible dimensions + an 8-dim byte-histogram feature from
    the payload alone.  Replace with a real decoder via set_decoder.
    """
    if not payload:
        raise ValueError("empty payload")
    w = 16 + payload[0] % 64
    h = 16 + payload[-1] % 64
    hist = [0.0] * 8
    for b in payload:
        hist[b % 8] += 1.0
    total = float(len(payload))
    return {
        "width": int(w),
        "height": int(h),
        "feature": [v / total for v in hist],
    }


# ---- real codec: PNG (pure stdlib) -----------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal valid grayscale-8 PNG writer (stdlib struct+zlib).

    ``pixels``: ``width*height`` raw bytes, row-major.  Each scanline
    gets filter byte 0 (None).  Exists so tests and the driver oracle
    can round-trip real PNGs without any image library.
    """
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width:(y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> dict:
    """Real PNG decode: IHDR header parse + IDAT inflate + defilter.

    Pure stdlib (struct + zlib).  Supports the subset ``png_encode``
    emits — 8-bit grayscale, filter 0 scanlines — and raises on
    anything else (signature mismatch, interlace, other filters), so a
    non-PNG payload routes to the failure side like any codec error.
    Returns the REAL width/height from the header and the 8-bin
    normalized histogram over the decoded PIXEL bytes (not the
    compressed container bytes) — proving the inflate+defilter path
    ran, not just the header read.
    """
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    width = height = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (bit_depth, color_type, interlace) != (8, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("bad IDAT length")
    pixels = bytearray()
    for y in range(height):
        row = raw[y * stride:(y + 1) * stride]
        if row[0] != 0:
            raise ValueError("unsupported PNG filter")
        pixels += row[1:]
    hist = [0.0] * 8
    for b in pixels:
        hist[b % 8] += 1.0
    total = float(len(pixels)) or 1.0
    return {
        "width": int(width),
        "height": int(height),
        "feature": [v / total for v in hist],
    }


def _image_decode(payload: bytes) -> dict:
    """Default image codec: real PNG when the payload IS one, else the
    deterministic fake (non-PNG blobs keep exercising the plumbing)."""
    if payload.startswith(_PNG_SIG):
        return png_decode(payload)
    return _fake_decode(payload)


set_decoder("image", _image_decode)
set_decoder("audio", _fake_decode)
set_decoder("video", _fake_decode)


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Arrow-batched; one Python worker pass per partition; failures
    surface as null features (quarantine-able downstream) rather than
    task aborts — the giraffe error-route discipline.
    """
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar construction: only the codec call itself is
            # per-row (inherent); n_bytes / checksum are C-speed over
            # the raw bytes and the output is built as column arrays
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            decs = []
            for kind, payload in zip(pdf["kind"], payloads):
                dec = _DECODERS.get(kind)
                try:
                    decs.append(dec(payload) if dec else None)
                except Exception:
                    decs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [zlib.crc32(p) for p in payloads],
                    "width": [d["width"] if d else None for d in decs],
                    "height": [d["height"] if d else None for d in decs],
                    "feature": [d["feature"] if d else None for d in decs],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def gen_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (for plumbing tests)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        size = 64 + int(rng.randint(0, 192))
        payload = bytes(bytearray(rng.randint(0, 256, size=size, dtype=np.int64) % 256))
        k = kinds[i % 3]
        rows.append(
            (
                i,
                k,
                payload,
                (64 + i % 128, 64 + (i * 7) % 128, 1000 + i, f"x/{k}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
