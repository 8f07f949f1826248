"""Block-max conjunction pruning differential tests.

The lead-driven prune (`IndexSearcher._conjunction_pruned_blocks`,
re-expressing `search/BlockMaxConjunctionBulkScorer.java` /
`ConjunctionDISI.java` lead-advance) must be invisible to results:
forced-on vs forced-off evaluation of random MUST/FILTER/SHOULD/
MUST_NOT booleans returns identical (doc_id, score) pairs, and the
prune must actually drop blocks when the lead is rare.
"""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.index import InvertedIndex
from lucene_spark.search import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    IndexSearcher,
    Occur,
    TermQuery,
)


def _corpus(rng, n_docs=500, vocab=40):
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for d in range(n_docs):
        n = 5 + int(rng.zipf(1.5)) % 40
        idx = np.minimum(rng.zipf(1.25, size=n) - 1, vocab - 1)
        rows.append((d, " ".join(words[i] for i in idx)))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _force(searcher, on: bool):
    searcher._PRUNE_MAX_LEAD_DOCS = 10**9 if on else -1
    searcher._PRUNE_MIN_RATIO = 0.0 if on else 10**9


@pytest.mark.parametrize("seed", [0, 3])
def test_pruned_equals_unpruned(spark, seed):
    rng = np.random.RandomState(seed)
    idx = InvertedIndex.build(
        spark.createDataFrame(_corpus(rng)),
        analyzer="simple",
        docs_per_segment=128,
    )
    s = IndexSearcher(idx)
    for trial in range(4):
        # rare-ish MUST lead + common SHOULD/FILTER/NOT companions
        must = f"w{rng.randint(10, 40)}"
        clauses = [BooleanClause(TermQuery(must), Occur.MUST)]
        clauses.append(
            BooleanClause(
                BoostQuery(TermQuery(f"w{rng.randint(0, 5)}"), 2.0),
                Occur.SHOULD,
            )
        )
        if trial % 2:
            clauses.append(
                BooleanClause(TermQuery(f"w{rng.randint(0, 3)}"), Occur.FILTER)
            )
        if trial >= 2:
            clauses.append(
                BooleanClause(
                    TermQuery(f"w{rng.randint(5, 9)}"), Occur.MUST_NOT
                )
            )
        q = BooleanQuery.of(*clauses)

        _force(s, False)
        off = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in s.search(q, k=400, mode="exhaustive").collect()
        )
        _force(s, True)
        on = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in s.search(q, k=400, mode="exhaustive").collect()
        )
        assert on == off, (seed, trial, must)


def test_prune_drops_blocks_for_rare_lead(spark):
    rng = np.random.RandomState(42)
    pdf = _corpus(rng, n_docs=600, vocab=30)
    # a genuinely rare term confined to two adjacent docs
    pdf.loc[10, "text"] += " rareterm"
    pdf.loc[11, "text"] += " rareterm"
    idx = InvertedIndex.build(
        spark.createDataFrame(pdf), analyzer="simple", docs_per_segment=64
    )
    s = IndexSearcher(idx)
    _force(s, True)
    q = BooleanQuery.of(
        BooleanClause(TermQuery("rareterm"), Occur.MUST),
        BooleanClause(TermQuery("w0"), Occur.SHOULD),
    )
    flat = s._flat_term_clauses(q)
    assert flat is not None
    ctx = s._bind(q)
    pruned = s._conjunction_pruned_blocks(ctx, flat, ["rareterm", "w0"])
    assert pruned is not None
    full = s._term_blocks(["rareterm", "w0"]).count()
    kept = pruned.count()
    assert kept < full  # w0 blocks away from docs 10/11 were dropped
    # and the pruned query still finds both rare docs
    hits = {r["doc_id"] for r in s.search(q, k=10, mode="exhaustive").collect()}
    assert hits == {10, 11}


def test_guards_disable_prune(spark):
    rng = np.random.RandomState(1)
    idx = InvertedIndex.build(
        spark.createDataFrame(_corpus(rng, n_docs=120)),
        analyzer="simple",
        docs_per_segment=64,
    )
    s = IndexSearcher(idx)  # default guards: tiny corpus, ratio won't pay
    q = BooleanQuery.of(
        BooleanClause(TermQuery("w5"), Occur.MUST),
        BooleanClause(TermQuery("w0"), Occur.SHOULD),
    )
    flat = s._flat_term_clauses(q)
    ctx = s._bind(q)
    # SHOULD-only boolean never prunes
    q2 = BooleanQuery.of(BooleanClause(TermQuery("w0"), Occur.SHOULD))
    flat2 = s._flat_term_clauses(q2)
    assert s._conjunction_pruned_blocks(ctx, flat2, ["w0"]) is None
    # ratio guard: forcing an absurd ratio keeps the full decode path
    s._PRUNE_MIN_RATIO = 10**9
    assert s._conjunction_pruned_blocks(ctx, flat, ["w5", "w0"]) is None
