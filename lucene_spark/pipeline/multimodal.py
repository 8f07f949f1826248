"""Multimodal columns: binary media + typed metadata, with REAL codecs
for the container formats that need no external libraries.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The decode layer is real, in pure numpy, for:

- **PPM (P6)** / **PGM (P5)** images — header + raw pixel planes;
- **BMP** (uncompressed 24/32-bit) — little-endian header, bottom-up
  padded rows;
- **WAV** (RIFF PCM) — fmt chunk → channels/rate/bits, data chunk →
  duration and int16 samples;
- **PPM streams** (concatenated P6 frames, the yuv4mpeg-style raw
  video shape) — frame sampling really splits frames.

Compressed codecs (JPEG/PNG/H.264/Opus) require libraries absent from
this environment: those payloads either raise a clearly-marked
``NotImplementedError`` (strict=True) or fall back to a deterministic
fake (default) so pipelines stay end-to-end testable. The Spark-side
shape is identical either way: bytes stay columnar in parquet, decode
runs once per Arrow batch (never per row), and derived features are
small typed columns so queries that don't need pixels never read them
(column pruning).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "image_features",
    "image_resize",
    "frame_sample",
    "decode_image",
    "decode_wav",
    "encode_ppm",
]

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes int, width int, height int, "
    "duration_ms int, codec string"
)

_FEATURES_SCHEMA = "media_id long, feat array<float>"
_FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"
_RESIZE_SCHEMA = "media_id long, payload binary, width int, height int"


# --- real pure-numpy codecs -------------------------------------------------


def _parse_pnm_header(b: bytes) -> Optional[Tuple[str, int, int, int]]:
    """(magic, width, height, header_end) for P5/P6, else None."""
    if len(b) < 2 or b[:1] != b"P" or b[1:2] not in (b"5", b"6"):
        return None
    magic = b[:2].decode()
    fields, i = [], 2
    while len(fields) < 3 and i < len(b):
        # skip whitespace and comments
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            return None
        fields.append(int(b[i:j]))
        i = j
    if len(fields) < 3 or i >= len(b):
        return None
    return magic, fields[0], fields[1], i + 1  # single whitespace after maxval


def decode_image(b: bytes) -> Optional[Tuple[np.ndarray, str]]:
    """payload → (H×W×C uint8 array, codec) for PPM/PGM/BMP, else None."""
    pnm = _parse_pnm_header(b)
    if pnm is not None:
        magic, w, h, off = pnm
        c = 3 if magic == "P6" else 1
        need = w * h * c
        if len(b) < off + need:
            return None
        arr = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
        return arr.reshape(h, w, c), ("ppm" if c == 3 else "pgm")
    if b[:2] == b"BM" and len(b) >= 54:
        off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
            return None
        nch = bpp // 8
        top_down = h < 0
        h = abs(h)
        row_bytes = (w * nch + 3) & ~3
        if len(b) < off + row_bytes * h:
            return None
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_bytes * h, offset=off
        ).reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            rows = rows[::-1]
        # BGR(A) → RGB
        return rows[:, :, [2, 1, 0]].copy(), "bmp"
    return None


def encode_ppm(img: np.ndarray) -> bytes:
    """H×W×3 uint8 → binary P6 bytes (the inverse of decode_image)."""
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_wav(b: bytes) -> Optional[dict]:
    """RIFF/WAVE PCM → {channels, rate, bits, n_samples, duration_ms,
    samples (first channel, int16 when 16-bit)}."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        sz = int.from_bytes(b[i + 4 : i + 8], "little")
        body = b[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1 or rate < 1 or bits not in (8, 16):
        return None
    bytes_per_frame = channels * bits // 8
    n_samples = len(data) // bytes_per_frame
    samples = None
    if bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=n_samples * channels
        ).reshape(-1, channels)[:, 0]
    return {
        "channels": channels,
        "rate": rate,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": int(n_samples * 1000 / rate),
        "samples": samples,
    }


def _split_ppm_stream(b: bytes) -> list:
    """Concatenated P6 frames → list of frame byte slices (raw video)."""
    frames, i = [], 0
    while i < len(b):
        pnm = _parse_pnm_header(b[i:])
        if pnm is None or pnm[0] != "P6":
            break
        _, w, h, off = pnm
        end = i + off + w * h * 3
        if end > len(b):
            break
        frames.append(b[i:end])
        i = end
    return frames


# --- stub for compressed codecs --------------------------------------------


def _fake_decode_header(payload: bytes, strict: bool) -> dict:
    """STUB for compressed codecs (JPEG/PNG/Opus/H.264 libs are not in
    this environment). The deterministic fake derives plausible metadata
    from the payload bytes so plumbing tests are stable."""
    if strict:
        raise NotImplementedError(
            "compressed-codec decode requires image/audio libs not present "
            "in this environment; use PPM/PGM/BMP/WAV payloads or strict=False"
        )
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return {
        "width": 64 + h % 512,
        "height": 64 + (h >> 9) % 512,
        "duration_ms": int(h % 10_000),
        "codec": ["jpeg", "png", "opus", "h264"][h % 4],
    }


def _meta_of(payload: bytes, strict: bool) -> dict:
    img = decode_image(payload)
    if img is not None:
        arr, codec = img
        return {
            "width": int(arr.shape[1]),
            "height": int(arr.shape[0]),
            "duration_ms": 0,
            "codec": codec,
        }
    wav = decode_wav(payload)
    if wav is not None:
        return {
            "width": 0,
            "height": 0,
            "duration_ms": wav["duration_ms"],
            "codec": "pcm_wav",
        }
    frames = _split_ppm_stream(payload)
    if len(frames) > 1:
        arr, _ = decode_image(frames[0])
        return {
            "width": int(arr.shape[1]),
            "height": int(arr.shape[0]),
            "duration_ms": 0,
            "codec": "ppm_stream",
        }
    return _fake_decode_header(payload, strict)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "kind",
    strict: bool = False,
) -> DataFrame:
    """binary payload → typed metadata row per media item (mapInPandas).

    Real header parse for PPM/PGM/BMP/WAV/PPM-stream; stub fallback for
    compressed codecs (see :func:`_fake_decode_header`)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col].values]
            metas = [_meta_of(p, strict) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "kind": pdf[kind_col].values,
                    "n_bytes": [len(p) for p in payloads],
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
    """payload → float feature vector.

    Decodable images get REAL features: per-channel mean/std plus a 2×2
    grid of region means, normalized to [0,1] and padded/truncated to
    `dim` (a classic color-moment descriptor — deterministic, codec-
    independent). Undecodable payloads fall back to the hash stub.
    """

    def one(p: bytes) -> np.ndarray:
        img = decode_image(p)
        if img is not None:
            arr = img[0].astype(np.float32) / 255.0
            if arr.shape[2] == 1:
                arr = np.repeat(arr, 3, axis=2)
            h, w = arr.shape[:2]
            means = arr.reshape(-1, 3).mean(axis=0)
            stds = arr.reshape(-1, 3).std(axis=0)
            grid = [
                arr[i * h // 2 : (i + 1) * h // 2, j * w // 2 : (j + 1) * w // 2]
                .mean()
                for i in range(2)
                for j in range(2)
            ]
            v = np.concatenate([means, stds, np.asarray(grid, dtype=np.float32)])
        else:
            if strict:
                raise NotImplementedError("compressed-codec decode unavailable")
            b = np.frombuffer(p.ljust(dim * 4, b"\0"), dtype=np.uint8)[: dim * 4]
            v = b.reshape(dim, 4).astype(np.float32).mean(axis=1) / 255.0
        v = v.astype(np.float32)
        if len(v) < dim:
            v = np.pad(v, (0, dim - len(v)))
        return v[:dim]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [one(bytes(p or b"")) for p in pdf[payload_col].values]
            yield pd.DataFrame({"media_id": pdf[id_col].values, "feat": feats})

    return df.select(id_col, payload_col).mapInPandas(fn, _FEATURES_SCHEMA)


def image_resize(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """REAL nearest-neighbor resize for decodable images → P6 payloads.

    Undecodable payloads pass through unchanged (strict=True raises),
    with width/height = -1 marking them for downstream routing.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for mid, p in zip(pdf[id_col].values, pdf[payload_col].values):
                b = bytes(p or b"")
                img = decode_image(b)
                if img is None:
                    if strict:
                        raise NotImplementedError("compressed-codec decode unavailable")
                    out["media_id"].append(mid)
                    out["payload"].append(b)
                    out["width"].append(-1)
                    out["height"].append(-1)
                    continue
                arr = img[0]
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                h, w = arr.shape[:2]
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = arr[yi][:, xi]
                out["media_id"].append(mid)
                out["payload"].append(encode_ppm(resized))
                out["width"].append(out_w)
                out["height"].append(out_h)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(fn, _RESIZE_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
    every_n: int = 1,
) -> DataFrame:
    """Video frame sampling.

    PPM streams (concatenated P6 frames) get REAL frame splitting —
    every `every_n`-th frame is emitted as its own valid P6 payload.
    Compressed containers fall back to the stub (one fake frame per
    `every_ms` of the fake duration), keeping the fan-out shape
    (media_id, frame_idx, frame binary) identical.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for mid, p in zip(pdf[id_col].values, pdf[payload_col].values):
                b = bytes(p or b"")
                frames = _split_ppm_stream(b)
                if frames:
                    for i, fr in enumerate(frames):
                        if i % every_n == 0:
                            out_id.append(mid)
                            out_idx.append(i)
                            out_frame.append(fr)
                    continue
                meta = _fake_decode_header(b, strict)
                n_frames = max(1, meta["duration_ms"] // every_ms)
                for i in range(int(n_frames)):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_frame.append(b[:16] + i.to_bytes(4, "little"))
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return df.select(id_col, payload_col).mapInPandas(fn, _FRAMES_SCHEMA)
