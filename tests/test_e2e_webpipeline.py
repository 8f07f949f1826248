"""North-star capstone: ONE end-to-end flow over Common-Crawl-shaped
pages — WARC archive bytes → record split → HTML extraction →
boilerplate removal → quality/language filtering → near-dup removal →
inverted-index build → BM25 / WAND retrieval — every stage the real
module, asserting cross-stage invariants (byte-identity, dedup
correctness, rank agreement between scoring paths)."""

import pytest
from pyspark.sql import functions as F

N_PAGES = 60


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    from lucene_spark.analysis.htmlstrip import extract_html_text
    from lucene_spark.corpus import synthetic_corpus
    from lucene_spark.index.builder import InvertedIndex
    from lucene_spark.pipeline.boilerplate import extract_main_content
    from lucene_spark.pipeline.dedup import minhash_lsh_pairs
    from lucene_spark.pipeline.textstats import quality_score
    from lucene_spark.sources.warc import read_warc, warc_bytes

    # 1. pages → a WARC archive on disk (wrap each text in chrome so
    #    boilerplate removal has something to do), incl. one near-dup
    base = synthetic_corpus(spark, N_PAGES, seed=7).collect()
    recs = []
    for r in base:
        body = (
            '<html><body><div class="nav"><a href="/">Home</a> '
            '<a href="/x">More</a></div><p>'
            + r.text.replace("&", "&amp;").replace("<", "&lt;")
            + '</p><div>Copyright <a href="/l">Legal</a> '
            '<a href="/p">Privacy</a></div></body></html>'
        )
        recs.append((r.url, "2026-01-01T00:00:00Z", body.encode()))
    # a near-duplicate of page 0 under a new url
    dup_text = base[0].text + " extra"
    recs.append((
        "http://dup.example/0", "2026-01-02T00:00:00Z",
        ("<p>" + dup_text + "</p>").encode(),
    ))
    d = tmp_path_factory.mktemp("warc")
    (d / "crawl-0.warc.gz").write_bytes(warc_bytes(recs, gzip_members=True))

    # 2. WARC source → pages
    pages = read_warc(spark, str(d))

    # 3. boilerplate-strip over the decoded page html (nav/footer out,
    #    content block back out byte-identical)
    from pyspark.sql.window import Window

    content = extract_main_content(
        pages.withColumn("page", F.decode("html", "UTF-8")),
        html_col="page",
    ).select("url", "warc_ts", F.col("content").alias("text"))

    # 4. quality cut: pages whose content block fell under the
    #    boilerplate length threshold have no extractable body — drop
    #    them (10 of the 60 synthetic pages are that short), then
    #    assign contiguous deterministic doc_ids
    docs = (
        content.filter(F.length("text") > 0)
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("warc_ts", "url")) - 1,
        )
        .localCheckpoint()
    )
    assert quality_score(docs).count() == docs.count()
    _ = extract_html_text  # (exercised via the strip inside step 3)
    # 5. near-dup removal via MinHash-LSH (drop the higher doc_id of
    #    each duplicate pair)
    pairs = minhash_lsh_pairs(docs, n=3, num_hashes=32, bands=8,
                              threshold=0.5)
    drop = pairs.select(
        F.greatest("doc_a", "doc_b").alias("doc_id")
    ).distinct()
    clean = (
        docs.join(drop, "doc_id", "left_anti")
        # contiguous docIDs again for the deterministic index build
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("doc_id")) - 1,
        )
        .localCheckpoint()
    )

    # 6. index + search
    idx = InvertedIndex.build(clean, analyzer="standard",
                              docs_per_segment=32)
    return {
        "base": base, "docs": docs, "pairs": pairs.collect(),
        "clean": clean, "idx": idx, "dup_text": dup_text,
    }


def test_extraction_recovers_exact_text(pipeline):
    """Boilerplate-stripped content == the original corpus text,
    byte-identical, for every page whose body clears the classifier's
    length threshold (shorter pages are dropped by design)."""
    got = {r.url: r.text for r in pipeline["docs"].collect()}
    checked = 0
    for r in pipeline["base"]:
        if len(r.text) >= 25:
            assert got[r.url] == r.text, r.url
            checked += 1
    assert checked == 50  # 10 of 60 synthetic pages are sub-threshold


def test_near_dup_detected_and_removed(pipeline):
    base0 = [r for r in pipeline["base"]][0]
    urls = {r.url for r in pipeline["clean"].collect()}
    # exactly one of (original page 0, its near-dup) survived
    assert len({base0.url, "http://dup.example/0"} & urls) == 1
    assert len(pipeline["pairs"]) >= 1


def test_search_end_to_end(pipeline):
    from lucene_spark.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(pipeline["idx"])
    # pick a word guaranteed present: from the surviving dup-pair text
    word = pipeline["base"][0].text.split()[0].lower()
    hits = s.search(TermQuery(word), k=10, mode="exhaustive").collect()
    assert hits, word
    # WAND and exhaustive agree on docIDs and scores
    disj = BooleanQuery.of(
        BooleanClause(TermQuery(word), Occur.SHOULD),
        BooleanClause(TermQuery("data"), Occur.SHOULD),
    )
    ex = s.search(disj, k=10, mode="exhaustive").collect()
    wa = s.search(disj, k=10, mode="wand").collect()
    assert [(r.doc_id, round(r.score, 5)) for r in ex] == [
        (r.doc_id, round(r.score, 5)) for r in wa
    ]


def test_no_dup_in_index(pipeline):
    # the index doc count matches the deduped corpus
    assert pipeline["idx"].doc_count == pipeline["clean"].count()
