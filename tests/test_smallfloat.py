"""SmallFloat quantization: golden values + round-trip properties.

Golden expectations derive from the reference algorithm
(`lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-171`):
NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 255 - 231 = 24.
"""

import numpy as np
import pytest

from lucene_spark.functions.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    long_to_int4,
)


def test_num_free_values():
    assert NUM_FREE_VALUES == 24
    assert long_to_int4(2**31 - 1) == 231


def test_long_to_int4_goldens():
    # subnormals stored exactly
    for i in range(8):
        assert long_to_int4(i) == i
        assert int4_to_long(long_to_int4(i)) == i
    # normal values: 3 mantissa bits + implicit 1
    assert long_to_int4(8) == 8  # bits 0, shift 0 stored as 1: 0 | (1 << 3)
    assert int4_to_long(long_to_int4(8)) == 8
    assert int4_to_long(long_to_int4(15)) == 15  # 4 significant bits kept
    assert int4_to_long(long_to_int4(17)) == 16  # 5th bit truncated


def test_int_to_byte4_exact_below_free():
    for i in range(NUM_FREE_VALUES):
        assert int_to_byte4(i) == i
        assert byte4_to_int(int_to_byte4(i)) == i


def test_round_trip_properties():
    xs = np.concatenate(
        [np.arange(0, 5000), np.array([10**5, 10**6, 10**7, 2**31 - 1])]
    )
    bs = int_to_byte4(xs)
    ds = byte4_to_int(bs)
    assert np.all(ds <= xs)  # rounds down
    assert np.all(bs <= 255)
    # monotone non-decreasing encode
    assert np.all(np.diff(bs.astype(int)) >= 0)
    # re-encoding the decoded value is a fixpoint
    assert np.array_equal(int_to_byte4(ds), bs)


def test_length_table():
    assert LENGTH_TABLE.shape == (256,)
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    assert LENGTH_TABLE[23] == 23.0
    assert np.all(np.diff(LENGTH_TABLE) >= 0)


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
    with pytest.raises(ValueError):
        long_to_int4(-5)
