"""Deflate compression-ratio quality signal (pipeline/textstats.py).

MassiveText/Gopher-family curation heuristic: low ratio = templated /
repetitive machine text, near-1 = natural prose, >1 = high-entropy
noise (deflate overhead)."""

import pandas as pd

from lucene_spark.pipeline.textstats import compression_ratio


def test_ratio_separates_repetition_from_prose(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "spam spam spam " * 60,
                    "Compression ratios separate boilerplate from genuine "
                    "prose because deflate models the repeated structure.",
                    None,
                ],
            }
        )
    )
    rows = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert rows[0]["ratio"] < 0.1
    assert 0.6 < rows[1]["ratio"] <= 1.1
    assert rows[2]["raw_bytes"] == 0 and rows[2]["ratio"] == 0.0


def test_ratio_matches_local_zlib(spark):
    import zlib

    texts = ["alpha beta gamma delta", "aaaa" * 25]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for i, t in enumerate(texts):
        b = t.encode()
        assert rows[i]["raw_bytes"] == len(b)
        assert rows[i]["compressed_bytes"] == len(zlib.compress(b, 6))
