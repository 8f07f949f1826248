"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns
with a typed metadata struct alongside. The Spark-side plumbing —
schemas, partition-friendly batch shapes, ``mapInPandas`` UDF
signatures — is real and tested; the actual codec work (JPEG decode,
resampling, frame extraction) is STUBBED because the image/audio
libraries are not available in this environment. Each stub is either a
clearly-marked ``NotImplementedError`` (strict mode) or a deterministic
fake (default) so pipelines are end-to-end testable.

At 100 TB scale the pattern is: media bytes stay columnar in parquet,
decode happens once per partition in Arrow batches (never per row), and
derived features (dims, duration, embeddings) are small typed columns
that downstream joins/filters use without touching the payload again —
column pruning means queries that don't need bytes never read them.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "image_features",
    "frame_sample",
]

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes int, width int, height int, "
    "duration_ms int, codec string"
)

_FEATURES_SCHEMA = "media_id long, feat array<float>"
_FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def _fake_decode_header(payload: bytes, strict: bool) -> dict:
    """STUB decode. Real impl would parse the container header (PIL/
    libav). The deterministic fake derives plausible metadata from the
    payload bytes so plumbing tests are stable."""
    if strict:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this "
            "environment; run with strict=False for the deterministic fake"
        )
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return {
        "width": 64 + h % 512,
        "height": 64 + (h >> 9) % 512,
        "duration_ms": int(h % 10_000),
        "codec": ["jpeg", "png", "opus", "h264"][h % 4],
    }


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "kind",
    strict: bool = False,
) -> DataFrame:
    """binary payload → typed metadata row per media item (mapInPandas)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_decode_header(bytes(p) if p is not None else b"", strict)
                for p in pdf[payload_col].values
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "kind": pdf[kind_col].values,
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf[payload_col].values],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "codec": [m["codec"] for m in metas],
                }
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(fn, MEDIA_META_SCHEMA)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
    strict: bool = False,
) -> DataFrame:
    """STUB feature extraction: payload → float vector.

    Real impl: decode + CNN/CLIP encoder per Arrow batch. Fake: a
    deterministic hash-derived vector (stable across runs/partitions),
    so downstream similarity-search plumbing is testable.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("image decode/encode libs unavailable")
            feats = []
            for p in pdf[payload_col].values:
                b = np.frombuffer(bytes(p or b"").ljust(dim * 4, b"\0"), dtype=np.uint8)[: dim * 4]
                v = b.reshape(dim, 4).astype(np.float32).mean(axis=1) / 255.0
                feats.append(v)
            yield pd.DataFrame({"media_id": pdf[id_col].values, "feat": feats})

    return df.select(id_col, payload_col).mapInPandas(fn, _FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """STUB video frame sampling: one fake frame per `every_ms` of the
    fake duration. Real impl: per-batch libav decode; the output shape
    (media_id, frame_idx, frame binary) and the explode-style fan-out
    are exactly what a real decoder would produce."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for mid, p in zip(pdf[id_col].values, pdf[payload_col].values):
                meta = _fake_decode_header(bytes(p or b""), strict)
                n_frames = max(1, meta["duration_ms"] // every_ms)
                for i in range(int(n_frames)):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_frame.append(bytes(p or b"")[:16] + i.to_bytes(4, "little"))
            yield pd.DataFrame({"media_id": out_id, "frame_idx": out_idx, "frame": out_frame})

    return df.select(id_col, payload_col).mapInPandas(fn, _FRAMES_SCHEMA)
