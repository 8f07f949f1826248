"""Lucene's lossy small-float quantization, ported bit-for-bit to numpy.

Semantics follow the reference implementation
(`lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-156`):

- ``long_to_int4``: float-like order-preserving encoding of positive
  longs keeping 4 significant bits (3 mantissa bits + implicit leading 1
  + shift; shift+1 stored so 0 marks subnormal values < 8).
- ``int_to_byte4`` / ``byte4_to_int``: byte encoding of non-negative
  ints; values below ``NUM_FREE_VALUES`` are exact, larger values go
  through ``long_to_int4`` (`SmallFloat.java:138-171`).

``NUM_FREE_VALUES = 255 - long_to_int4(2**31 - 1) = 24``.

All functions are vectorized: they accept numpy integer arrays (or
Python ints) and return numpy arrays (or ints).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "NUM_FREE_VALUES",
    "MAX_INT4",
    "LENGTH_TABLE",
]


def long_to_int4(i):
    """Order-preserving 4-significant-bit encoding of positive int64s."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    # numBits = 64 - numberOfLeadingZeros(i); 0 for i == 0
    num_bits = np.zeros_like(i)
    nz = i > 0
    # int64 values here are < 2**53 in practice (doc lengths); but keep
    # exact for the full range via frexp on float is unsafe — use bit math.
    num_bits[nz] = np.int64(64) - _nlz64(i[nz])
    subnormal = num_bits < 4
    shift = np.where(subnormal, 0, num_bits - 4)
    encoded = np.where(
        subnormal,
        i,
        ((i >> shift) & 0x07) | ((shift + 1) << 3),
    ).astype(np.int64)
    if encoded.ndim == 0:
        return int(encoded)
    return encoded


def _nlz64(x: np.ndarray) -> np.ndarray:
    """numberOfLeadingZeros for positive int64 arrays."""
    x = x.astype(np.uint64)
    n = np.full(x.shape, 64, dtype=np.int64)
    bits = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        hi = x >> np.uint64(s)
        take = hi != 0
        bits[take] += s
        x = np.where(take, hi, x)
    return n - bits - 1  # == 64 - (bits+1) for x>0


def int4_to_long(i):
    """Inverse of :func:`long_to_int4`."""
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    decoded = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    if decoded.ndim == 0:
        return int(decoded)
    return decoded


MAX_INT4 = long_to_int4(np.int64(2**31 - 1))  # 231
NUM_FREE_VALUES = 255 - MAX_INT4  # 24


def int_to_byte4(i):
    """Encode non-negative int to one byte (`SmallFloat.intToByte4`).

    Returns uint8 array (Java byte reinterpreted unsigned).
    """
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    small = i < NUM_FREE_VALUES
    enc = np.where(small, i, NUM_FREE_VALUES + long_to_int4(np.where(small, 0, i - NUM_FREE_VALUES)))
    out = (enc & 0xFF).astype(np.uint8)
    if out.ndim == 0:
        return int(out)
    return out


def byte4_to_int(b):
    """Decode bytes produced by :func:`int_to_byte4` (unsigned input)."""
    b = np.asarray(b).astype(np.int64) & 0xFF
    small = b < NUM_FREE_VALUES
    dec = np.where(small, b, NUM_FREE_VALUES + int4_to_long(np.where(small, 0, b - NUM_FREE_VALUES)))
    if dec.ndim == 0:
        return int(dec)
    return dec


# Lucene's 256-entry decoded-length table
# (`search/similarities/BM25Similarity.java:112-118`): LENGTH_TABLE[i] =
# byte4ToInt((byte) i) as float32.
LENGTH_TABLE = byte4_to_int(np.arange(256, dtype=np.int64)).astype(np.float32)
