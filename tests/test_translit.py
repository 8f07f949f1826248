"""ICUTransformFilter analog (`icu/ICUTransformFilter.java:58`):
pinned-table transliterations, 1:1 routes plan-asserted JVM-only."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.translit import TRANSFORM_IDS, icu_transform


def _one(spark, text, tid):
    df = spark.createDataFrame([(text,)], "s string")
    return df.select(icu_transform(F.col("s"), tid).alias("out")).collect()[0].out


def test_katakana_hiragana_roundtrip(spark):
    assert _one(spark, "カタカナ", "Katakana-Hiragana") == "かたかな"
    assert _one(spark, "かたかな", "Hiragana-Katakana") == "カタカナ"


def test_fullwidth_halfwidth(spark):
    assert _one(spark, "Ｈｅｌｌｏ　Ｗ１２３！", "Fullwidth-Halfwidth") == "Hello W123!"


def test_cyrillic_latin_iso9(spark):
    # ISO 9:1995 goldens: Москва → Moskva, щука → ŝuka, Ёж → Ëž
    assert _one(spark, "Москва", "Cyrillic-Latin") == "Moskva"
    assert _one(spark, "щука", "Cyrillic-Latin") == "ŝuka"
    assert _one(spark, "Ёж", "Cyrillic-Latin") == "Ëž"


def test_greek_latin_digraphs_longest_match(spark):
    # ου is a digraph rule and must beat ο+υ (o+y)
    assert _one(spark, "ουρανός"[:6], "Greek-Latin") == "ourano"
    assert _one(spark, "ψυχή", "Greek-Latin") == "psychi"
    assert _one(spark, "θεός", "Greek-Latin") == "theos"


def test_unknown_transform_raises(spark):
    with pytest.raises(ValueError):
        icu_transform(F.col("s"), "Klingon-Latin")
    assert "Cyrillic-Latin" in TRANSFORM_IDS


def test_one_to_one_routes_are_jvm_only(spark):
    df = spark.createDataFrame([("Ｘ",)], "s string").select(
        icu_transform(F.col("s"), "Fullwidth-Halfwidth").alias("o"),
        icu_transform(F.col("s"), "Cyrillic-Latin").alias("c"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
