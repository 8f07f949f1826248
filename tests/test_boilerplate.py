"""Boilerplate removal: block segmentation, link-density/length
classification, Spark-vs-DuckDB dual-implementation parity, and the
pure-JVM plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.boilerplate import (
    extract_main_content,
    oracle_main_content_sql,
)

PAGES = [
    # nav (linky+short) / content / short / link-dense footer
    (0, '<html><body><div><a href="/">Home</a> <a href="/a">AA</a></div>'
        "<p>This is the long-form article content block of this page.</p>"
        "<div>short</div>"
        '<div>Copyright 2026 <a href="/l">Legal</a> <a href="/p">Privacy</a>'
        "</div></body></html>"),
    # two content paragraphs, one too short
    (1, "<p>Tiny.</p><p>Another sufficiently long paragraph with enough "
        "characters to be kept as content.</p>"),
    # plain long block, no links at all
    (2, "<div>a quite long plain block of honest text content here</div>"),
    # entities decode inside the kept block
    (3, "<p>entities &amp; stuff kept when the block is long &lt;ok&gt;</p>"),
    # script/style/comment bodies never leak into content
    (4, "<div><script>var boilerplate = 'not content';</script>"
        "<!-- hidden -->actual visible words long enough to keep here"
        "<style>.x{}</style></div>"),
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    rows = extract_main_content(df).orderBy("doc_id").collect()
    return {r.doc_id: r for r in rows}


def test_nav_and_footer_dropped(extracted):
    r = extracted[0]
    assert r.n_kept == 1
    assert r.content == "This is the long-form article content block of this page."


def test_short_paragraph_dropped(extracted):
    r = extracted[1]
    assert r.n_kept == 1
    assert "Tiny" not in r.content


def test_linkless_long_block_kept(extracted):
    assert extracted[2].n_kept == 1
    assert extracted[2].content.startswith("a quite long plain block")


def test_entities_decoded(extracted):
    assert extracted[3].content == (
        "entities & stuff kept when the block is long <ok>"
    )


def test_script_style_comment_removed(extracted):
    assert extracted[4].content == (
        "actual visible words long enough to keep here"
    )
    assert "boilerplate" not in extracted[4].content


def test_duckdb_oracle_parity(extracted):
    con = duckdb.connect()
    vals = ",".join(
        "({}, '{}')".format(i, h.replace("'", "''")) for i, h in PAGES
    )
    con.execute(f"CREATE TABLE src AS SELECT * FROM (VALUES {vals}) t(doc_id, html)")
    frag = oracle_main_content_sql("html")
    rows = con.execute(
        f"WITH {frag.strip()} "
        "SELECT doc_id, n_blocks, n_kept, content FROM final ORDER BY doc_id"
    ).fetchall()
    for doc_id, nb, nk, ct in rows:
        r = extracted[doc_id]
        assert (r.n_blocks, r.n_kept, r.content) == (nb, nk, ct), doc_id


def test_plan_is_pure_jvm(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    plan = (
        extract_main_content(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_thresholds_configurable(spark):
    df = spark.createDataFrame([(0, "<p>12345</p>")], "doc_id long, html string")
    strict = extract_main_content(df, min_text_len=10).first()
    loose = extract_main_content(df, min_text_len=3).first()
    assert strict.n_kept == 0
    assert loose.n_kept == 1 and loose.content == "12345"


def test_stopword_density_feature(spark):
    """jusText's stopword-density signal: a long but function-word-free
    listing block drops when the density knob is on; prose survives.
    Dual-engine parity for the extended rule."""
    STOPS = ["the", "a", "of", "and", "is", "to", "in", "it"]
    pages = [
        (0, "<p>the quick fox is one of the animals in the forest and "
            "it runs</p>"
            "<p>alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima</p>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    off = extract_main_content(df).first()
    on = extract_main_content(
        df, stopwords=STOPS, min_stop_density_tenths=2
    ).first()
    assert off.n_kept == 2
    assert on.n_kept == 1
    assert on.content.startswith("the quick fox")

    con = duckdb.connect()
    vals = ",".join(
        "({}, '{}')".format(i, h.replace("'", "''")) for i, h in pages
    )
    con.execute(
        f"CREATE TABLE src AS SELECT * FROM (VALUES {vals}) t(doc_id, html)"
    )
    frag = oracle_main_content_sql(
        "html", stopwords=STOPS, min_stop_density_tenths=2
    )
    nb, nk, ct = con.execute(
        f"WITH {frag.strip()} "
        "SELECT n_blocks, n_kept, content FROM final"
    ).fetchone()
    assert (on.n_blocks, on.n_kept, on.content) == (nb, nk, ct)
