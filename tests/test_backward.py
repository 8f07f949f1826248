"""IndexUpgrader / backward-codecs analog
(core/index/IndexUpgrader.java:48): v1-format directories upgrade to
v2 with identical search results; current directories are no-ops."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.functions import forutil
from lucene_spark.index import InvertedIndex
from lucene_spark.index.backward import V1_FORMAT, V2_FORMAT, upgrade_index
from lucene_spark.search.parity import _bm25_scored_f64


def _corpus(spark, n=48):
    texts = [
        "apple banana cherry" if i % 3 else "delta echo foxtrot apple"
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame({"doc_id": range(n), "text": texts}))


def _save_v1(spark, corpus, path, drop_zones=True):
    """Fabricate a faithful old-format directory: build current, then
    downgrade every doc blob to the fused v1 FOR layout, drop the
    doc_zones column v1-era indexes predate, and stamp a v1 manifest
    (the reference's backward-codecs test framework ships old-format
    writers for the same purpose)."""
    import pandas as _pd

    from lucene_spark.functions.forutil import fordelta_decode
    from lucene_spark.index.backward import _v1_encode_docs

    idx = InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=16)
    idx.save(path)
    blocks = spark.read.parquet(os.path.join(path, "blocks"))
    pdf = blocks.toPandas()
    pdf["docs_packed"] = [
        _v1_encode_docs(fordelta_decode(bytes(b))) for b in pdf["docs_packed"]
    ]
    if drop_zones:
        pdf = pdf.drop(columns=["doc_zones"])
    tmp = os.path.join(path, "blocks_v1tmp")
    spark.createDataFrame(pdf, schema=None).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(os.path.join(path, "blocks"))
    os.replace(tmp, os.path.join(path, "blocks"))
    mp = os.path.join(path, "manifest.json")
    with open(mp) as f:
        m = json.load(f)
    m["format"] = V1_FORMAT
    with open(mp, "w") as f:
        json.dump(m, f)


def test_v1_load_refused_then_upgrade_restores_search(spark, tmp_path):
    corpus = _corpus(spark)
    path = str(tmp_path / "v1idx")
    _save_v1(spark, corpus, path)

    with pytest.raises(ValueError, match="v2"):
        InvertedIndex.load(spark, path)

    out = upgrade_index(spark, path)
    assert out == path
    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    assert m["format"] == V2_FORMAT and m["upgraded_from"] == V1_FORMAT

    upgraded = InvertedIndex.load(spark, path)
    expect = {
        (r["doc_id"], round(r["s"], 6))
        for r in _bm25_scored_f64(
            InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=16),
            {"apple": 1.0, "delta": 0.5},
        ).collect()
    }
    got = {
        (r["doc_id"], round(r["s"], 6))
        for r in _bm25_scored_f64(upgraded, {"apple": 1.0, "delta": 0.5}).collect()
    }
    assert got == expect


def test_upgrade_recomputes_exact_zones(spark, tmp_path):
    corpus = _corpus(spark)
    path = str(tmp_path / "v1zones")
    _save_v1(spark, corpus, path)
    upgrade_index(spark, path)
    blocks = spark.read.parquet(os.path.join(path, "blocks"))
    # exact bitmaps, not the -1 loader fallback
    assert blocks.filter(F.col("doc_zones") == -1).count() == 0


def test_current_format_is_noop(spark, tmp_path):
    corpus = _corpus(spark)
    path = str(tmp_path / "v2idx")
    InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=16).save(path)
    before = os.path.getmtime(os.path.join(path, "manifest.json"))
    assert upgrade_index(spark, path) == path
    assert os.path.getmtime(os.path.join(path, "manifest.json")) == before


def test_unknown_format_raises(spark, tmp_path):
    corpus = _corpus(spark)
    path = str(tmp_path / "vXidx")
    InvertedIndex.build(corpus, analyzer="simple", docs_per_segment=16).save(path)
    mp = os.path.join(path, "manifest.json")
    with open(mp) as f:
        m = json.load(f)
    m["format"] = "lucene_spark.v99"
    with open(mp, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="unknown index format"):
        upgrade_index(spark, path)
