"""SimpleTextCodec analog: text round-trip preserves the whole logical
index (postings, positions, norms, stats) — search-equivalent."""

import glob
import json
import os

import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.index.simpletext import (
    load_simpletext,
    save_simpletext,
)
from lucene_spark.search.parity import bm25_topk_f64


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"alpha beta{'' if i % 3 else ' gamma'} delta{i % 5} epsilon alpha")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _results(idx):
    return [
        (r["doc_id"], r["score"])
        for r in bm25_topk_f64(idx, {"alpha": 1.0, "gamma": 2.0}, k=20).collect()
    ]


def test_roundtrip_search_equivalent(spark, corpus, tmp_path):
    idx = InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=8)
    want = _results(idx)
    d = str(tmp_path / "st")
    save_simpletext(idx, d)
    loaded = load_simpletext(spark, d)
    assert _results(loaded) == want
    assert loaded.doc_count == idx.doc_count
    assert loaded.sum_total_term_freq == idx.sum_total_term_freq
    # per-term stats identical
    t0 = {
        r["term"]: (r["doc_freq"], r["total_term_freq"])
        for r in idx.terms.collect()
    }
    t1 = {
        r["term"]: (r["doc_freq"], r["total_term_freq"])
        for r in loaded.terms.collect()
    }
    assert t0 == t1


def test_roundtrip_positions_phrase(spark, corpus, tmp_path):
    from lucene_spark.search.positional import phrase_topk

    idx = InvertedIndex.build(
        corpus, analyzer="simple", docs_per_segment=8, positions=True
    )
    d = str(tmp_path / "stp")
    save_simpletext(idx, d)
    loaded = load_simpletext(spark, d)
    assert loaded.has_positions
    want = [
        (r["doc_id"], r["score"])
        for r in phrase_topk(idx, ["alpha", "beta"], k=15).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in phrase_topk(loaded, ["alpha", "beta"], k=15).collect()
    ]
    assert got == want and len(got) > 0


def test_files_are_human_readable(spark, corpus, tmp_path):
    idx = InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=8)
    d = str(tmp_path / "sth")
    save_simpletext(idx, d)
    lines = []
    for p in glob.glob(os.path.join(d, "postings", "part-*")):
        with open(p) as f:
            lines += [ln.strip() for ln in f if ln.strip()]
    assert lines and all(
        ln.startswith("seg=") and " term=" in ln for ln in lines
    )
    hdr = json.load(open(os.path.join(d, "header.json")))
    assert hdr["doc_count"] == 40


def test_load_rejects_foreign_dir(spark, tmp_path):
    d = str(tmp_path / "bad")
    os.makedirs(d)
    with open(os.path.join(d, "header.json"), "w") as f:
        json.dump({"format": "something.else"}, f)
    with pytest.raises(ValueError):
        load_simpletext(spark, d)


def test_payloads_rejected(spark, tmp_path):
    from lucene_spark.analysis.filters import delimited_payload_analyzer

    corpus = spark.createDataFrame(
        [(0, "a|1.0 b|2.0")], "doc_id long, text string"
    )
    idx = InvertedIndex.build(
        corpus,
        analyzer=delimited_payload_analyzer(),
        docs_per_segment=4,
        positions=True,
        payloads=True,
    )
    with pytest.raises(NotImplementedError):
        save_simpletext(idx, str(tmp_path / "pay"))


def test_roundtrip_adversarial_terms(spark, tmp_path):
    # terms containing the line-format field markers must survive:
    # real fields come first on each line and term= runs to EOL
    rows = [
        (0, "seg=5 doc=9 freq=3 pos=1,2 term=x plain"),
        (1, "plain seg=5 doc=9"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = InvertedIndex.build(
        corpus, analyzer="simple", docs_per_segment=2, positions=True
    )
    d = str(tmp_path / "adv")
    save_simpletext(idx, d)
    loaded = load_simpletext(spark, d)
    t0 = {
        r["term"]: (r["doc_freq"], r["total_term_freq"])
        for r in idx.terms.collect()
    }
    t1 = {
        r["term"]: (r["doc_freq"], r["total_term_freq"])
        for r in loaded.terms.collect()
    }
    assert t0 == t1
    assert t1["seg=5"] == (2, 2) and t1["term=x"] == (1, 1)


def test_roundtrip_preserves_deletes(spark, corpus, tmp_path):
    # review finding: a round trip must NOT resurrect deleted docs
    from lucene_spark.index.deletes import delete_by_query
    from lucene_spark.search.query import TermQuery

    idx = InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=8)
    idx = delete_by_query(idx, TermQuery("gamma"))
    assert idx.num_deleted > 0
    d = str(tmp_path / "std")
    save_simpletext(idx, d)
    loaded = load_simpletext(spark, d)
    assert loaded.num_deleted == idx.num_deleted
    got = {r["doc_id"] for r in
           bm25_topk_f64(loaded, {"gamma": 1.0}, k=40).collect()}
    assert got == set()  # every gamma doc was tombstoned
