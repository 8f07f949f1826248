"""BlendedInfixSuggester: position-blended weights vs a python oracle
(reciprocal + linear blenders, long truncation)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.search.suggest import blended_infix_suggest

SUGS = [
    ("merge sort of rows", 100),
    ("hash merge join", 90),
    ("rows then merge last", 80),
    ("no match here", 999),
    ("merge first", 50),
    ("a b c d e f g h i j k merger", 1000),
]


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(SUGS, "suggestion string, weight long")


def _brute(fragment, blender, linear_coef=0.10, n=10):
    out = []
    for s, w in SUGS:
        toks = s.split(" ")
        p = next(
            (i for i, t in enumerate(toks) if t.startswith(fragment)), None
        )
        if p is None:
            continue
        coef = 1.0 / (p + 1.0) if blender == "reciprocal" else 1.0 - linear_coef * p
        out.append((s, int(w * coef)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:n]


@pytest.mark.parametrize("blender", ["reciprocal", "linear"])
def test_blended_infix(sdf, blender):
    got = [
        (r["suggestion"], r["score"])
        for r in blended_infix_suggest(sdf, "mer", n=10, blender=blender).collect()
    ]
    assert got == _brute("mer", blender)


def test_position_zero_keeps_full_weight(sdf):
    got = dict(
        (r["suggestion"], r["score"])
        for r in blended_infix_suggest(sdf, "mer", n=10).collect()
    )
    assert got["merge sort of rows"] == 100
    assert got["hash merge join"] == 45  # position 1 → coef 1/2
    assert "no match here" not in got


def test_bad_blender(sdf):
    with pytest.raises(ValueError):
        blended_infix_suggest(sdf, "mer", blender="cosine")
