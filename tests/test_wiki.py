"""WikipediaTokenizer analog vs the reference's own goldens
(`TestWikipediaTokenizer.java`: testSimple, testHandwritten,
testLinkPhrases, testLinks, testLucene1133, testBoth)."""

from lucene_spark.analysis.wiki import (
    BOTH,
    TOKENS_ONLY,
    UNTOKENIZED_ONLY,
    UNTOKENIZED_TOKEN_FLAG,
    wikipedia_tokenize,
    wikipedia_tokenizer_udf,
)

LINK_PHRASES = (
    "click [[link here again]] click [http://lucene.apache.org here again]"
    " [[Category:a b c d]]"
)


def _incs(toks):
    out, prev = [], -1
    for t in toks:
        out.append(t["pos"] - prev)
        prev = t["pos"]
    return out


def test_simple():
    text = "This is a [[Category:foo]]"
    toks = wikipedia_tokenize(text)
    assert [t["term"] for t in toks] == ["This", "is", "a", "foo"]
    assert [t["start"] for t in toks] == [0, 5, 8, 21]
    assert [t["end"] for t in toks] == [4, 7, 9, 24]
    assert [t["type"] for t in toks] == [
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "c",
    ]
    assert _incs(toks) == [1, 1, 1, 1]


HANDWRITTEN = (
    "[[link]] This is a [[Category:foo]] Category  This is a linked "
    "[[:Category:bar none withstanding]] "
    "Category This is (parens) This is a [[link]]  This is an external URL "
    "[http://lucene.apache.org] "
    "Here is ''italics'' and ''more italics'', '''bold''' and "
    "'''''five quotes''''' "
    " This is a [[link|display info]]  This is a period.  Here is $3.25 and "
    "here is 3.50.  Here's Johnny.  "
    "==heading== ===sub head=== followed by some text  [[Category:blah| ]] "
    "''[[Category:ital_cat]]''  here is some that is ''italics "
    "[[Category:foo]] but is never closed."
    "'''same [[Category:foo]] goes for this '''''and2 [[Category:foo]] and "
    "this [http://foo.boo.com/test/test/ Test Test] "
    "[http://foo.boo.com/test/test/test.html Test Test] "
    "[http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
    '<ref>Citation</ref> <sup>martian</sup> <span class="glue">code</span>'
)

A = "<ALPHANUM>"
HW_GOLDEN = [
    ("link", "il"), ("This", A), ("is", A), ("a", A), ("foo", "c"),
    ("Category", A), ("This", A), ("is", A), ("a", A), ("linked", A),
    ("bar", "c"), ("none", "c"), ("withstanding", "c"), ("Category", A),
    ("This", A), ("is", A), ("parens", A), ("This", A), ("is", A), ("a", A),
    ("link", "il"), ("This", A), ("is", A), ("an", A), ("external", A),
    ("URL", A), ("http://lucene.apache.org", "elu"), ("Here", A), ("is", A),
    ("italics", "i"), ("and", A), ("more", "i"), ("italics", "i"),
    ("bold", "b"), ("and", A), ("five", "bi"), ("quotes", "bi"),
    ("This", A), ("is", A), ("a", A), ("link", "il"), ("display", "il"),
    ("info", "il"), ("This", A), ("is", A), ("a", A), ("period", A),
    ("Here", A), ("is", A), ("3.25", "<NUM>"), ("and", A), ("here", A),
    ("is", A), ("3.50", "<NUM>"), ("Here's", "<APOSTROPHE>"), ("Johnny", A),
    ("heading", "h"), ("sub", "sh"), ("head", "sh"), ("followed", A),
    ("by", A), ("some", A), ("text", A), ("blah", "c"), ("ital", "c"),
    ("cat", "c"), ("here", A), ("is", A), ("some", A), ("that", A),
    ("is", A), ("italics", "i"), ("foo", "c"), ("but", A), ("is", A),
    ("never", A), ("closed", A), ("same", "b"), ("foo", "c"), ("goes", A),
    ("for", A), ("this", A), ("and2", "bi"), ("foo", "c"), ("and", A),
    ("this", A), ("http://foo.boo.com/test/test/", "elu"), ("Test", "el"),
    ("Test", "el"), ("http://foo.boo.com/test/test/test.html", "elu"),
    ("Test", "el"), ("Test", "el"),
    ("http://foo.boo.com/test/test/test.html?g=b&c=d", "elu"),
    ("Test", "el"), ("Test", "el"), ("Citation", "ci"), ("martian", A),
    ("code", A),
]


def test_handwritten():
    toks = wikipedia_tokenize(HANDWRITTEN)
    got = [(t["term"], t["type"]) for t in toks]
    assert got == HW_GOLDEN


def test_link_phrases_position_increments():
    toks = wikipedia_tokenize(LINK_PHRASES)
    assert [t["term"] for t in toks] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c", "d",
    ]
    assert _incs(toks) == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_links():
    text = (
        "[http://lucene.apache.org/java/docs/index.html#news here]"
        " [http://lucene.apache.org/java/docs/index.html?b=c here]"
        " [https://lucene.apache.org/java/docs/index.html?b=c here]"
    )
    toks = wikipedia_tokenize(text)
    assert [(t["term"], t["type"]) for t in toks] == [
        ("http://lucene.apache.org/java/docs/index.html#news", "elu"),
        ("here", "el"),
        ("http://lucene.apache.org/java/docs/index.html?b=c", "elu"),
        ("here", "el"),
        ("https://lucene.apache.org/java/docs/index.html?b=c", "elu"),
        ("here", "el"),
    ]


LUCENE_1133 = (
    "[[Category:a b c d]] [[Category:e f g]] [[link here]] [[link there]] "
    "''italics here'' something ''more italics'' [[Category:h   i   j]]"
)


def test_tokens_only_ignores_untok_set():
    # TOKENS_ONLY output is identical regardless of untokenizedTypes
    base = wikipedia_tokenize(LINK_PHRASES, TOKENS_ONLY)
    with_untok = wikipedia_tokenize(LINK_PHRASES, TOKENS_ONLY, {"c", "i"})
    assert base == with_untok


def test_lucene_1133_untokenized_only():
    toks = wikipedia_tokenize(LUCENE_1133, UNTOKENIZED_ONLY, {"c", "i"})
    assert [t["term"] for t in toks] == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j",
    ]
    assert [t["start"] for t in toks] == [11, 32, 42, 47, 56, 61, 71, 86, 98, 124]
    assert [t["end"] for t in toks] == [18, 37, 46, 51, 60, 66, 83, 95, 110, 133]
    assert _incs(toks) == [1] * 10


def test_both():
    toks = wikipedia_tokenize(LUCENE_1133, BOTH, {"c", "i"})
    assert [t["term"] for t in toks] == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g",
        "link", "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics",
        "h   i   j", "h", "i", "j",
    ]
    assert [t["start"] for t in toks] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71, 79, 86,
        98, 98, 103, 124, 124, 128, 132,
    ]
    assert [t["end"] for t in toks] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78, 83, 95,
        110, 102, 110, 133, 125, 129, 133,
    ]
    assert _incs(toks) == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 0,
        1, 1,
    ]
    flags = [t["flags"] for t in toks]
    spans = [i for i, t in enumerate(toks) if " " in t["term"]]
    assert all(flags[i] == UNTOKENIZED_TOKEN_FLAG for i in spans)
    assert all(f == 0 for i, f in enumerate(flags) if i not in spans)


def test_udf_roundtrip(spark):
    df = spark.createDataFrame(
        [(0, "This is a [[Category:foo]]"), (1, "''it'' [http://x.com y]")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    rows = (
        df.select("doc_id", wikipedia_tokenizer_udf()("text").alias("t"))
        .select("doc_id", F.explode("t").alias("tok"))
        .select("doc_id", "tok.term", "tok.type", "tok.pos")
        .orderBy("doc_id", "pos")
        .collect()
    )
    got = [(r["doc_id"], r["term"], r["type"]) for r in rows]
    assert got == [
        (0, "This", A), (0, "is", A), (0, "a", A), (0, "foo", "c"),
        (1, "it", "i"), (1, "http://x.com", "elu"), (1, "y", "el"),
    ]


def test_plain_text_col(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.wiki import wiki_plain_text_col

    rows = [
        (0, "''Intro'' [[Category:cats]] See [[link|the docs]] and "
            "[[other]] at [http://x.com the site] ==Head== "
            "<ref>cite</ref> done."),
        (1, "[http://bare.com] plain <span class='x'>text</span>"),
        (2, "'''''bold''''' and [[:Category:hidden]] tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        r["t"]
        for r in df.select(wiki_plain_text_col(F.col("text")).alias("t"))
        .orderBy("doc_id")
        .collect()
    ]
    assert got == [
        "Intro See the docs and other at the site Head done.",
        "plain text",
        "bold and tail",
    ]


def test_plain_text_is_codegen_only(spark):
    from pyspark.sql import functions as F

    from lucene_spark.analysis.wiki import wiki_plain_text_col

    df = spark.range(3).select(
        F.concat(F.lit("[[a|b]] "), F.col("id")).alias("text")
    )
    plan = (
        df.select(wiki_plain_text_col(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
