"""MappingCharFilter / PatternReplaceCharFilter / PatternTokenizer
analogs (`charfilter/MappingCharFilter.java:36`,
`pattern/PatternTokenizer.java:50`)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.charfilter import (
    mapping_char_filter,
    pattern_replace_char_filter,
    pattern_tokens,
    simple_pattern_split_tokens,
    translate_chars,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "s string")
    return df.select(col.alias("out")).collect()[0].out


def test_translate_chars_jvm(spark):
    out = _one(spark, "çafé", translate_chars(F.col("s"), {"ç": "c", "é": "e"}))
    assert out == "cafe"


def test_translate_chars_rejects_multichar(spark):
    with pytest.raises(ValueError):
        translate_chars(F.col("s"), {"ph": "f"})


def test_mapping_longest_match_wins(spark):
    # TestMappingCharFilter-style rules: 'aa'->'x' must beat 'a'->'y'
    out = _one(
        spark, "aab a", mapping_char_filter(F.col("s"), {"aa": "x", "a": "y"})
    )
    assert out == "xb y"


def test_mapping_output_not_rescanned(spark):
    # 'a'->'b', 'b'->'c': one pass — produced 'b' must NOT become 'c'
    out = _one(spark, "ab", mapping_char_filter(F.col("s"), {"a": "b", "b": "c"}))
    assert out == "bc"


def test_mapping_deletion_and_expansion(spark):
    out = _one(
        spark,
        "i.b.m. & co",
        mapping_char_filter(F.col("s"), {".": "", "&": "and"}),
    )
    assert out == "ibm and co"


def test_pattern_replace_char_filter(spark):
    out = _one(
        spark, "a  b\t c", pattern_replace_char_filter(F.col("s"), r"\s+", " ")
    )
    assert out == "a b c"


def test_pattern_tokens_split_drops_empties(spark):
    out = _one(spark, ",a,,b,", pattern_tokens(F.col("s"), ","))
    assert out == ["a", "b"]


def test_pattern_tokens_group_capture(spark):
    out = _one(
        spark,
        "x=1; y=22; z=333",
        pattern_tokens(F.col("s"), r"(\w+)=(\d+)", group=2),
    )
    assert out == ["1", "22", "333"]


def test_simple_split_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("a b",)], "s string").select(
        simple_pattern_split_tokens(F.col("s"), r"\s+").alias("t")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
