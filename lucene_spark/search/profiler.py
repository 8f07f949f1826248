"""Query profiler: per-node breakdown of a query tree.

Analog of the sandbox profiler family
(`sandbox/src/java/org/apache/lucene/sandbox/search/
ProfilerCollector.java:35`, `QueryProfilerIndexSearcher.java`,
`QueryProfilerTree.java`): wraps a search and reports, per node of the
query tree, the node's type, a human description, its match count, and
wall time. The reference result is (name, reason, time, children)
(ProfilerCollector.java:114); timings are inherently run-dependent, so
:func:`profile_df` exposes only the deterministic columns (preorder
node id, depth, name, description, match count) — that is what the
correctness gate hashes — while :func:`profile_tree` adds the measured
`time_ms` for interactive use, mirroring `ProfilerCollectorResult`.

Scale shape: each node's match count is one distributed count over the
node's unscored match set (`IndexSearcher._matching_docs` — the same
FILTER-path plan the query itself executes, posting-block decode +
distinct + count, no driver materialization beyond the scalar). A
profile of a q-node tree costs q counts; profiling is a diagnostic
run, not a hot path.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiTermQuery,
    PhraseQuery,
    Query,
    TermQuery,
    rewrite,
)

__all__ = ["profile_df", "profile_tree"]


def _describe(q: Query) -> str:
    if isinstance(q, TermQuery):
        return q.term
    if isinstance(q, PhraseQuery):
        return " ".join(q.terms)
    if isinstance(q, MultiTermQuery):
        # pattern-ish attribute names vary per subclass
        for attr in ("prefix", "pattern", "term", "lower"):
            v = getattr(q, attr, None)
            if v is not None:
                return str(v)
        return ""
    if isinstance(q, BooleanQuery):
        return f"{len(q.clauses)} clauses"
    if isinstance(q, DisjunctionMaxQuery):
        return f"tie={q.tie_breaker}"
    if isinstance(q, BoostQuery):
        return f"boost={q.boost}"
    return ""


def _children(q: Query) -> List[Query]:
    if isinstance(q, BooleanQuery):
        return [c.query for c in q.clauses]
    if isinstance(q, DisjunctionMaxQuery):
        return list(q.queries)
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return [q.query]
    return []


def _walk(
    searcher,
    q: Query,
    depth: int,
    rows: List[Tuple],
    times: Optional[List[float]],
) -> None:
    node = len(rows)
    rows.append(None)  # reserve preorder slot
    t0 = time.monotonic()
    rw = rewrite(q, searcher.index.terms)
    if isinstance(rw, MatchNoDocsQuery):
        cnt = 0
    else:
        ctx = searcher._bind(rw)
        cnt = (
            searcher._live(searcher._matching_docs(rw, ctx))
            .select("doc_id")
            .distinct()
            .count()
        )
    elapsed = (time.monotonic() - t0) * 1000.0
    rows[node] = (node, depth, type(q).__name__, _describe(q), cnt)
    if times is not None:
        times.append(elapsed)
    for child in _children(q):
        _walk(searcher, child, depth + 1, rows, times)


def profile_df(searcher, query: Query) -> DataFrame:
    """Deterministic profile: one row per query-tree node in preorder —
    (node, depth, name, description, docs). `docs` is the node's
    unscored match count over live docs (the Weight's cost the
    reference profiler attributes to each node)."""
    rows: List[Tuple] = []
    _walk(searcher, query, 0, rows, None)
    return searcher.index.spark.createDataFrame(
        rows, "node int, depth int, name string, description string, docs long"
    )


def profile_tree(searcher, query: Query) -> dict:
    """ProfilerCollectorResult-shaped dict: {name, reason/description,
    time_ms, docs, children} — the interactive variant with wall time."""
    rows: List[Tuple] = []
    times: List[float] = []
    _walk(searcher, query, 0, rows, times)

    def build(i: int) -> Tuple[dict, int]:
        node, depth, name, desc, docs = rows[i]
        out = {
            "name": name,
            "description": desc,
            "time_ms": times[i],
            "docs": docs,
            "children": [],
        }
        j = i + 1
        while j < len(rows) and rows[j][1] > depth:
            if rows[j][1] == depth + 1:
                child, j = build(j)
                out["children"].append(child)
            else:  # pragma: no cover — build() consumes deeper rows
                j += 1
        return out, j

    tree, _ = build(0)
    return tree
