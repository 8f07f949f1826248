"""Monitor analog: reverse search (percolation / alerting).

Re-expression of Lucene's monitor module
(`lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:42`):
a registered set of queries is matched against a stream of documents —
"which saved searches fire for this doc?" — instead of documents
against one query.

Spark shape: the query set is tiny (it's user-registered alerts), so it
broadcasts; each Arrow batch of documents is analyzed once
(`term_freqs`) and every query tree is evaluated against the per-doc
term-frequency dict in numpy/python (the monitor's in-memory matcher).
Works identically over a static DataFrame or inside
``readStream...foreachBatch`` (alerting).

Supported query nodes: Term, Boolean (SHOULD/MUST/FILTER/MUST_NOT,
minimum_number_should_match), ConstantScore/Boost wrappers, Phrase
(exact, via term positions recomputed from text), Prefix/Wildcard/
Regexp/Fuzzy/TermInSet/TermRange (matched against the doc's own term
set — monitor-style, no index needed).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from lucene_spark.analysis import analyze
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

__all__ = ["match_monitor_queries"]


def _levenshtein(a: str, b: str, limit: int) -> int:
    if abs(len(a) - len(b)) > limit:
        return limit + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        if min(cur) > limit:
            return limit + 1
        prev = cur
    return prev[-1]


def _matches(q: Query, tf: dict, toks: List[Tuple[str, int]]) -> bool:
    """Evaluate a query tree against one doc's term freqs + positions."""
    if isinstance(q, MatchAllDocsQuery):
        return True
    if isinstance(q, MatchNoDocsQuery):
        return False
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return _matches(q.query, tf, toks)
    if isinstance(q, TermQuery):
        return q.term in tf
    if isinstance(q, PhraseQuery):
        positions = {}
        for t, p in toks:
            positions.setdefault(t, []).append(p)
        if any(t not in positions for t in q.terms):
            return False
        if q.slop == 0:
            first = positions[q.terms[0]]
            rest = [set(positions.get(t, ())) for t in q.terms[1:]]
            return any(
                all(p + i + 1 in s for i, s in enumerate(rest)) for p in first
            )
        # sloppy: reuse the forward-search kernels so a registered
        # '"a b"~2' alert fires for exactly the docs phrase_freqs finds
        import numpy as np

        from lucene_spark.search.positional import (
            _sloppy_phrase_kernel,
            _sloppy_phrase_kernel_repeats,
        )

        pos_cols = [np.asarray(positions[t], dtype=np.int64) for t in q.terms]
        offsets = list(range(len(q.terms)))
        if len(set(q.terms)) != len(q.terms):
            return (
                _sloppy_phrase_kernel_repeats(pos_cols, offsets, q.slop, list(q.terms))
                > 0
            )
        return _sloppy_phrase_kernel(pos_cols, offsets, q.slop) > 0
    if isinstance(q, PrefixQuery):
        return any(t.startswith(q.prefix) for t in tf)
    if isinstance(q, WildcardQuery):
        rx = "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in q.pattern
        ) + "$"
        pat = re.compile(rx)
        return any(pat.match(t) for t in tf)
    if isinstance(q, RegexpQuery):
        pat = re.compile("^(?:" + q.regexp + ")$")
        return any(pat.match(t) for t in tf)
    if isinstance(q, FuzzyQuery):
        if q.transpositions:
            from lucene_spark.functions.editdist import damerau_levenshtein

            return any(damerau_levenshtein(t, q.term) <= q.max_edits for t in tf)
        return any(_levenshtein(t, q.term, q.max_edits) <= q.max_edits for t in tf)
    if isinstance(q, TermInSetQuery):
        return any(t in tf for t in q.terms)
    if isinstance(q, TermRangeQuery):
        return any(q.lower <= t <= q.upper for t in tf)
    if isinstance(q, BooleanQuery):
        should = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
        must = [c.query for c in q.clauses if c.occur in (Occur.MUST, Occur.FILTER)]
        nots = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]
        if any(_matches(s, tf, toks) for s in nots):
            return False
        if not all(_matches(m, tf, toks) for m in must):
            return False
        n_should = sum(1 for s in should if _matches(s, tf, toks))
        need = q.minimum_number_should_match or (0 if must else (1 if should else 0))
        return n_should >= need
    raise NotImplementedError(f"monitor match: {type(q).__name__}")


_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("query_id", T.StringType(), False),
    ]
)


def match_monitor_queries(
    docs: DataFrame,
    queries: Sequence[Tuple[str, Query]],
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    analyzer: str = "simple",
) -> DataFrame:
    """(doc_id, query_id) for every registered query a doc matches.

    ``queries``: [(query_id, query_tree)]. Works on batch DataFrames
    and inside streaming foreachBatch alike.
    """
    qlist = list(queries)
    needs_positions = _any_phrase(qlist)
    # Presearcher (`monitor/TermFilteredPresearcher.java:60-120`): index
    # the registered queries by a required-term signature so each doc
    # only evaluates queries that COULD match — per-doc cost scales
    # with candidate queries, not registered queries. Queries whose
    # match set isn't term-bounded (MatchAll, prefix/wildcard/fuzzy/
    # range patterns) fall into the always-evaluate bucket, the
    # reference's ANYTOKEN field.
    term_map: dict = {}
    always: list = []
    for i, (_, q) in enumerate(qlist):
        req = _required_terms(q)
        if req is None:
            always.append(i)
        else:
            for t in req:
                term_map.setdefault(t, []).append(i)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_docs, out_qids = [], []
            for doc_id, text in zip(pdf[doc_id_col].values, pdf[text_col].values):
                if not isinstance(text, str):
                    continue
                if analyzer == "standard":
                    toks = analyze(text)
                else:
                    toks = [(t, p) for p, t in enumerate(text.split(" ")) if t]
                tf: dict = {}
                for t, _ in toks:
                    tf[t] = tf.get(t, 0) + 1
                cand = set(always)
                for t in tf:
                    cand.update(term_map.get(t, ()))
                for i in sorted(cand):
                    qid, q = qlist[i]
                    if _matches(q, tf, toks if needs_positions else []):
                        out_docs.append(int(doc_id))
                        out_qids.append(qid)
            yield pd.DataFrame({"doc_id": out_docs, "query_id": out_qids})

    return docs.select(doc_id_col, text_col).mapInPandas(fn, _MATCH_SCHEMA)


def _required_terms(q):
    """A term set of which a matching doc must contain AT LEAST ONE, or
    None when no such bound exists (query goes to the always bucket).

    Sound over-approximation rules (never prunes a true match):
    Term → {term}; Phrase → {first term} (a match needs every term);
    Boolean: a MUST/FILTER clause's set alone suffices (conjunction);
    pure-SHOULD needs the union of all clause sets — if any SHOULD
    clause is unbounded the whole query is. MUST_NOT never bounds.
    """
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return _required_terms(q.query)
    if isinstance(q, TermQuery):
        return frozenset([q.term])
    if isinstance(q, PhraseQuery):
        return frozenset([q.terms[0]]) if q.terms else None
    if isinstance(q, TermInSetQuery):
        return frozenset(q.terms)
    if isinstance(q, BooleanQuery):
        musts = [c.query for c in q.clauses if c.occur in (Occur.MUST, Occur.FILTER)]
        for m in musts:
            req = _required_terms(m)
            if req is not None:
                return req
        if musts:
            return None  # conjunction exists but no clause is bounded
        union: set = set()
        for c in q.clauses:
            if c.occur != Occur.SHOULD:
                continue
            req = _required_terms(c.query)
            if req is None:
                return None
            union.update(req)
        return frozenset(union) if union else None
    return None


def _any_phrase(qlist) -> bool:
    def walk(q) -> bool:
        if isinstance(q, PhraseQuery):
            return True
        if isinstance(q, (BoostQuery, ConstantScoreQuery)):
            return walk(q.query)
        if isinstance(q, BooleanQuery):
            return any(walk(c.query) for c in q.clauses)
        return False

    return any(walk(q) for _, q in qlist)
