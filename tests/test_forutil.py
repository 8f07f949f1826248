"""FOR/PFor/delta codec round-trips (property-style, seeded).

Mirrors the conformance role of BasePostingsFormatTestCase (SURVEY §5.3).
"""

import numpy as np
import pytest

from lucene_spark.functions.forutil import (
    BLOCK_SIZE,
    MAX_EXCEPTIONS,
    delta_decode,
    delta_encode,
    for_decode,
    for_encode,
    pfor_decode,
    pfor_encode,
)


def test_constants():
    assert BLOCK_SIZE == 128  # Lucene103PostingsFormat.BLOCK_SIZE
    assert MAX_EXCEPTIONS == 7  # PForUtil budget


@pytest.mark.parametrize("seed", range(20))
def test_for_round_trip(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(1, BLOCK_SIZE + 1)
    vals = rng.randint(0, 2**rng.randint(1, 31), size=n).astype(np.int64)
    assert np.array_equal(for_decode(for_encode(vals)), vals)


@pytest.mark.parametrize("seed", range(20))
def test_pfor_round_trip(seed):
    rng = np.random.RandomState(seed + 100)
    n = rng.randint(1, BLOCK_SIZE + 1)
    vals = rng.zipf(1.2, n).astype(np.int64) % (2**25)
    assert np.array_equal(pfor_decode(pfor_encode(vals)), vals)


def test_pfor_exceptions_save_space():
    # 121 small values + 7 outliers: PFor should beat FOR clearly
    vals = np.array([1] * (BLOCK_SIZE - 7) + [10**6] * 7, dtype=np.int64)
    assert len(pfor_encode(vals)) < len(for_encode(vals)) / 3


def test_pfor_respects_exception_budget():
    # 8 outliers cannot be patched at width 1; codec must stay correct
    vals = np.array([1] * 120 + [10**6] * 8, dtype=np.int64)
    assert np.array_equal(pfor_decode(pfor_encode(vals)), vals)


@pytest.mark.parametrize("seed", range(10))
def test_delta_round_trip(seed):
    rng = np.random.RandomState(seed + 500)
    n = rng.randint(1, BLOCK_SIZE + 1)
    docs = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    deltas = delta_encode(docs)
    assert np.array_equal(delta_decode(deltas), docs)
    assert np.all(deltas[1:] >= 1)  # strictly increasing docs → positive gaps


def test_empty_block():
    vals = np.array([], dtype=np.int64)
    assert for_decode(for_encode(vals)).size == 0


# --- fordelta (v2 doc-block layout: u8 base + FOR over gaps) --------------

from lucene_spark.functions.forutil import fordelta_decode, fordelta_encode


@pytest.mark.parametrize("seed", range(20))
def test_fordelta_roundtrip(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(0, 2 * BLOCK_SIZE)
    ids = np.unique(
        rng.randint(0, 2**40, size=n).astype(np.int64)
    ) if n else np.empty(0, dtype=np.int64)
    assert (fordelta_decode(fordelta_encode(ids)) == ids).all()


def test_fordelta_width_ignores_absolute_base():
    # the block base must not inflate the packed gap width: two blocks
    # with identical gaps but bases 1 vs 10^9 differ by the header only
    gaps = np.arange(1, 129, dtype=np.int64)
    low = np.concatenate([[1], 1 + np.cumsum(gaps)])
    high = low + 1_000_000_000
    assert len(fordelta_encode(low)) == len(fordelta_encode(high))
