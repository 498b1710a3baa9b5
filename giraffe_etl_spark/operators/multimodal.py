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


set_decoder("image", _fake_decode)
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
