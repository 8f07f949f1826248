"""TREC topics/qrels/run parsing (benchmark/quality/trec analogs) and
the end-to-end qrels → quality_stats wiring."""

import pytest

from lucene_spark.search.trec import (
    format_trec_run,
    parse_qrels,
    parse_trec_run,
    parse_trec_topics,
    qrels_df,
    trec_topics_df,
)

TOPICS = """
# a comment
<top>
<num> Number: 301
<title> International Organized Crime

<desc> Description:
Identify organizations that participate in international criminal
activity.

<narr> Narrative:
A relevant document must describe such an organization.
</top>
<top>
<num> Number: 302
<title>
Poliomyelitis and Post-Polio
<desc> Description:
Is the disease under control?
<narr> Narrative:
Any mention counts.
</top>
"""

QRELS = """
# qnum 0 doc rel
301 0 doc303 1
301 0 doc7295 0
301 0 doc42 2
302 0 docA 1
"""


def test_parse_topics():
    ts = parse_trec_topics(TOPICS)
    assert [t["query_id"] for t in ts] == ["301", "302"]
    assert ts[0]["title"] == "International Organized Crime"
    assert ts[0]["description"].startswith("Identify organizations")
    assert ts[0]["narrative"].startswith("A relevant document")
    # title on the line after an empty <title> tag
    assert ts[1]["title"] == "Poliomyelitis and Post-Polio"


def test_parse_qrels_drops_zero():
    # TrecJudge.java:72 keeps only relevant docs
    rows = parse_qrels(QRELS)
    assert ("301", "doc7295", 0) not in rows
    assert ("301", "doc303", 1) in rows
    assert ("301", "doc42", 2) in rows
    with pytest.raises(ValueError):
        parse_qrels("301 0 doc1")


def test_run_roundtrip():
    rows = [("301", "doc303", 1, 12.5), ("301", "doc42", 2, 11.0)]
    text = format_trec_run(rows, tag="t")
    assert text.splitlines()[0] == "301 Q0 doc303 1 12.5000 t"
    back = parse_trec_run(text)
    assert back == [("301", "doc303", 1, 12.5), ("301", "doc42", 2, 11.0)]


def test_end_to_end_quality(spark):
    from lucene_spark.search.quality import quality_stats

    judg = qrels_df(spark, QRELS)
    run = spark.createDataFrame(
        [("301", "doc303", 2.0), ("301", "docX", 1.5),
         ("301", "doc42", 1.0), ("302", "docB", 9.0)],
        "query_id string, doc_id string, score double",
    )
    out = {r.query_id: r for r in quality_stats(run, judg, k=10).collect()}
    assert out["301"].mrr == 1.0          # first hit relevant
    assert out["301"].recall_at_k == 1.0  # both relevant docs retrieved
    assert out["302"].ap == 0.0           # docA never retrieved
    t = trec_topics_df(spark, TOPICS)
    assert t.count() == 2
