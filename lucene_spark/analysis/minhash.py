"""MinHashFilter (analysis/minhash/MinHashFilter.java:48): bucketed
128-bit min-hash tokens over a shingle stream, with exact hash parity.

The reference hashes each shingle's UTF-16LE bytes with
MurmurHash3_x64_128 (seed 0), re-hashes per hash-function index via
``combineOrdered`` with the murmur of the function index's big-endian
int bytes, keeps the ``hashSetSize`` smallest values per 2^32/bucket
bucket of the hash space (unsigned (val2, val1) order), optionally
rotates the first following non-empty bucket's minimum into empty
buckets, and emits each kept 128-bit value as UTF-16 code units.

This module reproduces all of that bit-for-bit (the murmur and token
vectors from TestMinHashFilter.java pass verbatim) and adds a
hex-encoded emission for the Spark surface — raw UTF-16 code units can
be unpaired surrogates, which Arrow/UTF-8 transport rejects, so the
UDF ships ``<hash_idx>:<32-hex-digit>`` strings instead. The pipeline
module `pipeline/dedup.py` keeps its own vectorized MinHash-LSH for
bulk dedup; this is the analyzer-level surface with reference parity.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import pandas as pd

__all__ = [
    "murmur3_x64_128",
    "min_hash_tokens",
    "min_hash_hex",
    "min_hash_udf",
]

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> Tuple[int, int]:
    """MinHashFilter.murmurhash3_x64_128 (MinHashFilter.java:416);
    returns (val1, val2) as UNSIGNED 64-bit ints."""
    h1 = h2 = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n & ~15
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(data[i : i + 8], "little")
        k2 = int.from_bytes(data[i + 8 : i + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = data[rounded:]
    t = len(tail)
    if t > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if t > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1

    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


@lru_cache(maxsize=4096)
def _int_hash(i: int) -> Tuple[int, int]:
    """murmur of the hash-function index's 4 big-endian bytes."""
    return murmur3_x64_128(i.to_bytes(4, "big"))


def _combine_ordered(a: Tuple[int, int], b: Tuple[int, int]):
    """combineOrdered (MinHashFilter.java:347) over (val1, val2)."""
    return ((a[0] * 37 + b[0]) & _M64, (a[1] * 37 + b[1]) & _M64)


def _min_hash_sets(
    tokens: Sequence[str],
    hash_count: int,
    bucket_count: int,
    hash_set_size: int,
    with_rotation: bool,
):
    """The accumulation pass of incrementToken
    (MinHashFilter.java:149-203): per (hash, bucket) keep the
    hash_set_size smallest rehashed values; rotation backfills empty
    buckets from the next non-empty one (hash_set_size == 1 only)."""
    if hash_count <= 0 or bucket_count <= 0 or hash_set_size <= 0:
        raise ValueError("hashCount/bucketCount/hashSetSize must be > 0")
    bucket_size = (1 << 32) // bucket_count
    if (1 << 32) % bucket_count != 0:
        bucket_size += 1
    # sort key: unsigned (val2, val1) — LongPair.compareTo
    sets = [[[] for _ in range(bucket_count)] for _ in range(hash_count)]
    for tok in tokens:
        raw = murmur3_x64_128(tok.encode("utf-16-le"))
        for i in range(hash_count):
            v1, v2 = _combine_ordered(raw, _int_hash(i))
            bucket = (v2 >> 32) // bucket_size
            s = sets[i][bucket]
            key = (v2, v1)
            if key in s:
                continue
            if len(s) >= hash_set_size:
                worst = max(s)
                if key >= worst:
                    continue
                s.remove(worst)
            s.append(key)
    if with_rotation and hash_set_size == 1:
        for i in range(hash_count):
            for b in range(bucket_count):
                if not sets[i][b]:
                    for off in range(1, bucket_count):
                        src = sets[i][(b + off) % bucket_count]
                        if src:
                            sets[i][b] = [min(src)]
                            break
    return sets


def _emit_chars(hash_idx: int, key, hash_count: int) -> str:
    """Token emission (MinHashFilter.java:208-231): UTF-16 code units
    of the 128-bit value, prefixed by the hash index when several
    hash functions are in play."""
    v2, v1 = key
    chars: List[int] = []
    if hash_count > 1:
        chars += [(hash_idx >> 16) & 0xFFFF, hash_idx & 0xFFFF]
    chars += [
        (v2 >> 48) & 0xFFFF, (v2 >> 32) & 0xFFFF,
        (v2 >> 16) & 0xFFFF, v2 & 0xFFFF,
        (v1 >> 48) & 0xFFFF, (v1 >> 32) & 0xFFFF,
    ]
    if hash_count == 1:
        chars += [(v1 >> 16) & 0xFFFF, v1 & 0xFFFF]
    return "".join(chr(c) for c in chars)


def min_hash_tokens(
    tokens: Sequence[str],
    hash_count: int = 1,
    bucket_count: int = 512,
    hash_set_size: int = 1,
    with_rotation: bool | None = None,
) -> List[str]:
    """Exact-parity token emission (may contain unpaired surrogates —
    in-memory comparison only). withRotation defaults to
    ``bucket_count > 1`` like MinHashFilterFactory."""
    if with_rotation is None:
        with_rotation = bucket_count > 1
    sets = _min_hash_sets(
        tokens, hash_count, bucket_count, hash_set_size, with_rotation
    )
    out = []
    for i in range(hash_count):
        for b in range(bucket_count):
            for key in sorted(sets[i][b]):
                out.append(_emit_chars(i, key, hash_count))
    return out


def min_hash_hex(
    tokens: Sequence[str],
    hash_count: int = 1,
    bucket_count: int = 512,
    hash_set_size: int = 1,
    with_rotation: bool | None = None,
) -> List[str]:
    """Arrow-safe emission: ``<hash_idx>:<val2 hex16><val1 hex16>``
    per kept value, same selection as `min_hash_tokens`."""
    if with_rotation is None:
        with_rotation = bucket_count > 1
    sets = _min_hash_sets(
        tokens, hash_count, bucket_count, hash_set_size, with_rotation
    )
    out = []
    for i in range(hash_count):
        for b in range(bucket_count):
            for v2, v1 in sorted(sets[i][b]):
                out.append(f"{i}:{v2:016x}{v1:016x}")
    return out


def min_hash_udf(
    hash_count: int = 1,
    bucket_count: int = 512,
    hash_set_size: int = 1,
    with_rotation: bool | None = None,
):
    """Arrow-batched column op: array<string> shingles →
    array<string> hex min-hash tokens. One narrow projection."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _mh(s: pd.Series) -> pd.Series:
        return s.map(
            lambda toks: min_hash_hex(
                list(toks), hash_count, bucket_count, hash_set_size,
                with_rotation,
            )
            if toks is not None
            else None
        )

    return _mh
