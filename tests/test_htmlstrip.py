"""HTMLStripCharFilter analog: markup removal, entity decoding, the
byte-identical text-extraction invariant, codegen-vs-UDF tier parity,
and the escapedTags option."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.htmlstrip import (
    extract_html_text,
    html_strip_col,
    html_strip_str,
    html_strip_udf,
)

GOLDENS = [
    ("<p>hello</p>", "hello\n"),
    ("<b>bold</b> and <i>italic</i>", "bold and italic"),
    ("a<br>b<br/>c<br />d", "a\nb\nc\nd"),
    ("<!-- comment -->text", "text"),
    ("<script>var x = 1 < 2;</script>rest", "rest"),
    ("<style type='text/css'>p > a { }</style>rest", "rest"),
    ("<SCRIPT>\nalert('<p>')\n</SCRIPT>ok", "ok"),
    ("<![CDATA[kept < 3 chars]]>", "kept < 3 chars"),
    ("&lt;tag&gt; &amp; &quot;q&quot;", '<tag> & "q"'),
    # &amp;lt; is the TEXT "&lt;", not "<"
    ("&amp;lt;", "&lt;"),
    ("<!DOCTYPE html><p>x</p>", "x\n"),
    ("<?xml version='1.0'?>y", "y"),
    ('<a href="/x" title="t>u">link</a>', "link"),
    ("<div>a</div><div>b</div>", "a\nb\n"),
    ("no markup at all", "no markup at all"),
    ("", ""),
]


@pytest.mark.parametrize("src,want", GOLDENS)
def test_strip_goldens_python(src, want):
    assert html_strip_str(src) == want


def test_numeric_entities_python_tier():
    # decimal + hex numeric character references (html.unescape)
    assert html_strip_str("&#233;t&#xe9;") == "été"
    assert html_strip_str("&eacute;") == "é"  # full named table


def test_none_passthrough():
    assert html_strip_str(None) is None


def test_escaped_tags_kept():
    src = "<div><b>keep</b> <i>strip</i></div>"
    out = html_strip_str(src, escaped_tags=["b"])
    assert out == "<b>keep</b> strip\n"
    # escaped block tag: no newline substitution either
    out2 = html_strip_str("<p>x</p><div>y</div>", escaped_tags=["p"])
    assert out2 == "<p>x</p>y\n"
    # escaped br stays verbatim
    assert html_strip_str("a<br>b", escaped_tags=["br"]) == "a<br>b"


def test_codegen_tier_matches_python_tier(spark):
    df = spark.createDataFrame([(s,) for s, _ in GOLDENS], "html string")
    got = df.select(
        html_strip_col(F.col("html")).alias("a"),
        html_strip_udf()(F.col("html")).alias("b"),
    ).collect()
    for row, (src, want) in zip(got, GOLDENS):
        assert row.a == want, src
        assert row.a == row.b, src


def test_codegen_tier_is_pure_jvm(spark):
    df = spark.range(4).select(F.lit("<p>x</p>").alias("html"))
    plan = (
        df.select(html_strip_col(F.col("html")).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_byte_identical_roundtrip(spark):
    """The north-rule invariant: wrap arbitrary text in page markup
    (entity-encoding the text), strip, get the original bytes back."""
    texts = [
        "plain words",
        "a < b && c > d",
        'quotes "x" & more',
        "multi\nline\ntext",
        "unicode: héllo wörld ünïcode 中文 эн",
        "literal entity in source: &lt;kept&gt;",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    enc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    html = F.concat(
        F.lit("<html><head><script>if (1<2) {}</script></head><body><p>"),
        enc,
        F.lit("</p></body></html>"),
    )
    got = (
        df.select("text", html_strip_col(html).alias("extracted"))
        .collect()
    )
    for row in got:
        assert row.extracted == row.text + "\n", row.text


def test_extract_html_text_binary_column(spark):
    df = spark.createDataFrame(
        [("u1", "<p>page body</p>".encode("utf-8"))], "url string, html binary"
    )
    out = extract_html_text(df, binary=True, out_col="t").select("t").first()
    assert out.t == "page body\n"
    # exact_entities tier decodes numeric references too
    df2 = spark.createDataFrame(
        [("u2", b"<p>caf&#233;</p>")], "url string, html binary"
    )
    out2 = (
        extract_html_text(df2, binary=True, out_col="t", exact_entities=True)
        .select("t")
        .first()
    )
    assert out2.t == "café\n"
