"""HalfFloatPoint sortable-short encoding
(sandbox/document/HalfFloatPoint.java:34): round-trip, order
preservation, rounding, nextUp/nextDown fixed points, UDF parity."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.functions.halffloat import (
    half_float_sortable_udf,
    half_float_to_sortable_short,
    half_next_down,
    half_next_up,
    sortable_short_to_half_float,
)


def test_round_trip_exact_halves():
    vals = [0.0, 1.0, -1.0, 0.5, 65504.0, -65504.0, 6.103515625e-05]
    back = sortable_short_to_half_float(half_float_to_sortable_short(vals))
    assert back.tolist() == vals


def test_sortable_order_matches_value_order():
    rng = np.random.default_rng(5)
    vals = np.concatenate(
        [rng.normal(scale=100, size=500), [-np.inf, np.inf, 0.0, -0.0]]
    ).astype(np.float32)
    enc = half_float_to_sortable_short(vals)
    dec = sortable_short_to_half_float(enc)
    # the sortable contract: int16 order implies value order (with
    # -0.0 folded strictly below +0.0 on the encoded line, like the
    # reference's sortableShortBits)
    order = np.argsort(enc, kind="stable")
    assert np.all(np.diff(dec[order]) >= 0)


def test_rounding_is_nearest_even():
    # 2049 is exactly between halves 2048 and 2050 -> ties-to-even 2048
    assert sortable_short_to_half_float(
        half_float_to_sortable_short([2049.0])
    )[0] == 2048.0
    assert sortable_short_to_half_float(
        half_float_to_sortable_short([2051.0])
    )[0] == 2052.0


def test_overflow_and_denormals():
    enc = half_float_to_sortable_short([1e9, -1e9, 1e-40])
    dec = sortable_short_to_half_float(enc)
    assert dec[0] == np.inf and dec[1] == -np.inf and dec[2] == 0.0


def test_next_up_down():
    assert half_next_up(1.0) == 1.0 + 2 ** -10
    assert half_next_down(1.0) == 1.0 - 2 ** -11
    assert half_next_up(65504.0) == math.inf
    assert half_next_up(math.inf) == math.inf
    assert math.isnan(half_next_up(float("nan")))
    # reference javadoc: nextUp(-0.0) == +0.0 on the sortable line
    assert half_next_up(-2 ** -24) == -0.0


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-65504, max_value=65504, allow_nan=False))
def test_round_trip_is_nearest_half(v):
    dec = float(sortable_short_to_half_float(half_float_to_sortable_short([v]))[0])
    assert dec == float(np.float16(v))  # numpy fp16 IS the reference rounding


def test_udf_matches_numpy(spark):
    vals = [0.0, 1.5, -3.25, 1e9, -1e-9, 2049.0]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = [r["s"] for r in df.select(half_float_sortable_udf()("v").alias("s")).collect()]
    assert got == half_float_to_sortable_short(vals).tolist()
