"""Block-max WAND pruning on a clustered corpus: the prune must fire.

The r4 verdict flagged WAND's win margin as nominal (4% at the 1M
stress) because the Zipf corpus's impacts saturate per-block. This
pins the behavior the prune exists for — a BP-style clustered doc
order where hot (high-tf) docs are contiguous, so low-impact blocks
fall below theta - max_ub(other) and are skipped — plus its control:
the same docs scattered, where every block holds a hot doc, impacts
saturate, and the searcher takes the exhaustive-shaped fallback.

Semantics pinned against `WANDScorer.java:301-317` (block upper-bound
test) and `ImpactsDISI`'s skip decision.
"""

import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search import (
    BooleanClause,
    BooleanQuery,
    IndexSearcher,
    Occur,
    TermQuery,
)

N = 1536  # 12 blocks of 128 postings per term


def _rows(clustered: bool):
    """1/3 hot docs (focus x8 lens x4), 1/3 cold (x1 each), 1/3 absent.

    Clustered: hot docs first (what bp_reorder produces on topical
    text). Scattered: topics interleave doc-by-doc, so every
    128-posting block contains a hot doc.
    """
    texts = []
    for i in range(N):
        topic = (i * 3) // N if clustered else i % 3
        pad = f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 7}"
        if topic == 0:
            texts.append(pad + " " + " ".join(["focus"] * 8 + ["lens"] * 4))
        elif topic == 1:
            texts.append(pad + " focus lens")
        else:
            texts.append(pad)
    return pd.DataFrame({"doc_id": range(N), "text": texts})


QUERY = BooleanQuery.of(
    BooleanClause(TermQuery("focus"), Occur.SHOULD),
    BooleanClause(TermQuery("lens"), Occur.SHOULD),
)


@pytest.fixture(scope="module")
def clustered(spark):
    df = spark.createDataFrame(_rows(clustered=True))
    return IndexSearcher(
        InvertedIndex.build(df, analyzer="simple", docs_per_segment=N)
    )


@pytest.fixture(scope="module")
def scattered(spark):
    df = spark.createDataFrame(_rows(clustered=False))
    return IndexSearcher(
        InvertedIndex.build(df, analyzer="simple", docs_per_segment=N)
    )


def _hits(df):
    return [(r["doc_id"], round(r["score"], 4)) for r in df.collect()]


def test_clustered_prunes_blocks(clustered):
    clustered.wand_collect_stats = True
    got = _hits(clustered.search(QUERY, k=10, mode="wand"))
    st = clustered.last_wand_stats
    assert st is not None and not st.get("saturated", False)
    assert st["prunable"] is True
    assert st["pruned"] > 0, st
    # the cold third contributes ~half of each term's postings; on a
    # clustered order those blocks are pure-cold and all prunable
    assert st["pruned"] >= 0.3 * st["blocks"], st
    # pruning is an optimization, never a semantics change
    assert got == _hits(clustered.search(QUERY, k=10, mode="exhaustive"))


def test_scattered_saturates(scattered):
    """Interleaved hot docs -> every block's max impact is the global
    max -> avg f == max f -> the degenerate-case router skips the
    theta/prune jobs entirely (and must still match exhaustive)."""
    scattered.wand_collect_stats = True
    got = _hits(scattered.search(QUERY, k=10, mode="wand"))
    st = scattered.last_wand_stats
    assert st is not None and st.get("saturated", False) is True
    assert got == _hits(scattered.search(QUERY, k=10, mode="exhaustive"))


def test_stats_off_by_default(clustered):
    s = IndexSearcher(clustered.index)
    s.search(QUERY, k=10, mode="wand").collect()
    st = s.last_wand_stats
    # prune fires (telemetry fields present) but no count job ran
    assert st["prunable"] is True and st["blocks"] is None
