"""Query tree + rewrite rules (Lucene Query/IndexSearcher.rewrite analog).

Mirrors the immutable Query tree and its simplification rules
(`lucene/core/src/java/org/apache/lucene/search/BooleanQuery.java:240-368`,
`search/IndexSearcher.java:860-878`, `search/MultiTermQuery.java:39-103`):

- single-SHOULD-clause BooleanQuery unwraps to the clause;
- duplicate FILTER/MUST_NOT clauses dedup;
- the same query in MUST and MUST_NOT → MatchNoDocsQuery;
- multi-term queries (prefix/wildcard/regexp/fuzzy/range/set) rewrite
  to a constant-score disjunction over the matched terms from the terms
  table (CONSTANT_SCORE_REWRITE).

These are plain Python dataclasses; the *physical* plan (DataFrame
program) is produced by :mod:`lucene_spark.search.searcher`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Occur",
    "Query",
    "TermQuery",
    "BooleanClause",
    "BooleanQuery",
    "ConstantScoreQuery",
    "DisjunctionMaxQuery",
    "BoostQuery",
    "MatchAllDocsQuery",
    "MatchNoDocsQuery",
    "PrefixQuery",
    "WildcardQuery",
    "RegexpQuery",
    "FuzzyQuery",
    "TermInSetQuery",
    "TermRangeQuery",
    "PhraseQuery",
    "SpanNearQuery",
    "SpanNotQuery",
    "MultiTermFilterDocsQuery",
    "TooManyClauses",
    "rewrite",
    "probe_term_set",
    "get_max_clause_count",
    "set_max_clause_count",
]


class TooManyClauses(Exception):
    """`IndexSearcher$TooManyClauses`: a multi-term query expanded to
    more than the clause cap under a boolean rewrite method."""


_MAX_CLAUSE_COUNT = 1024  # IndexSearcher.maxClauseCount default


def get_max_clause_count() -> int:
    return _MAX_CLAUSE_COUNT


def set_max_clause_count(n: int) -> None:
    """`IndexSearcher.setMaxClauseCount` analog (process-wide)."""
    global _MAX_CLAUSE_COUNT
    if n < 1:
        raise ValueError("max clause count must be >= 1")
    _MAX_CLAUSE_COUNT = int(n)


class Occur(Enum):
    SHOULD = "SHOULD"
    MUST = "MUST"
    FILTER = "FILTER"  # matches like MUST but does not score
    MUST_NOT = "MUST_NOT"


class Query:
    """Base class; subclasses are frozen dataclasses (hashable)."""


@dataclass(frozen=True)
class TermQuery(Query):
    term: str


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    reason: str = ""


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: "Query"
    # score contributed per matching doc is the wrapping boost (default 1)


@dataclass(frozen=True)
class BoostQuery(Query):
    query: "Query"
    boost: float


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """max(sub scores) + tie_breaker * sum(other sub scores)
    (`search/DisjunctionMaxQuery.java:44`)."""

    queries: tuple
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur = Occur.SHOULD


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple
    minimum_number_should_match: int = 0

    @staticmethod
    def of(*clauses: BooleanClause, min_should_match: int = 0) -> "BooleanQuery":
        return BooleanQuery(tuple(clauses), min_should_match)


# --- multi-term queries: rewrite to term disjunctions ---------------------


@dataclass(frozen=True)
class MultiTermQuery(Query):
    """Base: expands against the terms table (term dictionary).

    ``rewrite_method`` mirrors `search/MultiTermQuery.java:39-103`:

    - ``"constant_score"`` (default, CONSTANT_SCORE_REWRITE): at most
      :func:`get_max_clause_count` matched terms expand to a
      constant-score term disjunction; ABOVE the cap the expansion
      stays distributed — a :class:`MultiTermFilterDocsQuery` whose
      matched-term set is a DataFrame semi-joined against the posting
      blocks, never collected to the driver.
    - ``"constant_score_boolean"`` / ``"scoring_boolean"``
      (CONSTANT_SCORE_BOOLEAN_REWRITE / SCORING_BOOLEAN_REWRITE):
      always expand to clauses; raise :class:`TooManyClauses` above
      the cap, like Lucene. ``scoring_boolean`` keeps per-term BM25
      scoring instead of the constant-score wrap.
    """

    rewrite_method: str = field(default="constant_score", kw_only=True)

    def term_filter(self):  # Column predicate over F.col("term")
        raise NotImplementedError


@dataclass(frozen=True)
class PrefixQuery(MultiTermQuery):
    prefix: str

    def term_filter(self):
        return F.col("term").startswith(self.prefix)


@dataclass(frozen=True)
class WildcardQuery(MultiTermQuery):
    pattern: str  # Lucene syntax: * any run, ? single char

    def term_filter(self):
        rx = "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else F"\\{c}" if c in r"\.[]{}()^$+|" else c
            for c in self.pattern
        ) + "$"
        return F.col("term").rlike(rx)


def lucene_regexp_to_java(s: str) -> str:
    """Translate Lucene RegExp syntax (`util/automaton/RegExp.java`)
    to an equivalent Java regex for RLIKE.

    Lucene regexps are implicitly anchored (handled by the caller) and
    add three operators Java lacks: ``@`` (any string), ``#`` (empty
    language) and ``<n-m>`` (decimal numeric interval). The standard
    operators (``. ? * + {} () [] |``) pass through unchanged.
    ``~`` (complement) and ``&`` (intersection) require automaton
    algebra that a backtracking regex cannot express — they raise,
    loudly, like Lucene's optional-flag gating.
    """
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            out.append(s[i : i + 2])
            i += 2
            continue
        if c == "@":
            out.append(".*")
        elif c == "#":
            out.append("(?!x)x")  # matches nothing
        elif c == "<":
            j = s.index(">", i)
            lo, hi = s[i + 1 : j].split("-")
            lo_i, hi_i = int(lo), int(hi)
            if hi_i - lo_i > 10_000:
                raise NotImplementedError(
                    "numeric interval wider than 10000 not supported"
                )
            out.append("(?:" + "|".join(str(x) for x in range(lo_i, hi_i + 1)) + ")")
            i = j + 1
            continue
        elif c in "~&":
            raise NotImplementedError(
                f"Lucene RegExp operator {c!r} (complement/intersection) "
                "needs automaton algebra; rewrite the query without it"
            )
        else:
            out.append(c)
        i += 1
    return "".join(out)


@dataclass(frozen=True)
class RegexpQuery(MultiTermQuery):
    """`search/RegexpQuery.java`: Lucene RegExp syntax, anchored,
    expanded against the term dictionary."""

    regexp: str

    def term_filter(self):
        return F.col("term").rlike("^(?:" + lucene_regexp_to_java(self.regexp) + ")$")


@dataclass(frozen=True)
class FuzzyQuery(MultiTermQuery):
    """`search/FuzzyQuery.java`: transpositions=True (the default)
    uses Damerau-Levenshtein so "teh"~1 matches "the"; False falls back
    to plain Levenshtein (JVM built-in)."""

    term: str
    max_edits: int = 2
    transpositions: bool = True

    def term_filter(self):
        # length window prunes JVM-side (|len diff| <= edit distance
        # for both metrics) before the exact distance check
        t = F.lit(self.term)
        window = (F.length("term") >= F.length(t) - self.max_edits) & (
            F.length("term") <= F.length(t) + self.max_edits
        )
        if not self.transpositions:
            return window & (F.levenshtein(F.col("term"), t) <= self.max_edits)
        from lucene_spark.functions.editdist import damerau_within_udf

        return window & damerau_within_udf(self.term, self.max_edits)(F.col("term"))


@dataclass(frozen=True)
class TermInSetQuery(MultiTermQuery):
    terms: tuple

    def term_filter(self):
        return F.col("term").isin(list(self.terms))


@dataclass(frozen=True)
class TermRangeQuery(MultiTermQuery):
    lower: Optional[str]
    upper: Optional[str]
    include_lower: bool = True
    include_upper: bool = True

    def term_filter(self):
        c = F.lit(True)
        if self.lower is not None:
            c = c & (
                F.col("term") >= self.lower if self.include_lower else F.col("term") > self.lower
            )
        if self.upper is not None:
            c = c & (
                F.col("term") <= self.upper if self.include_upper else F.col("term") < self.upper
            )
        return c


@dataclass(frozen=True)
class MultiTermFilterDocsQuery(Query):
    """Distributed CONSTANT_SCORE expansion of a multi-term query that
    matched more than the clause cap.

    The matched-term set is re-derived lazily as
    ``terms.filter(source.term_filter())`` and SEMI-JOINED against the
    posting blocks by the searcher — the term list never materializes
    on the driver and the plan carries no per-term literal, so a
    ``PrefixQuery("s")`` over a web-scale dictionary stays a
    distributed join (`MultiTermQuery.java` CONSTANT_SCORE_REWRITE via
    MultiTermQueryConstantScoreWrapper, which likewise scores from the
    postings without building a boolean query)."""

    source: "MultiTermQuery"


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Phrase query over an index built with ``positions=True``
    (`search/PhraseQuery.java:71-152`); exact when slop=0, sloppy
    matching via :mod:`lucene_spark.search.positional` otherwise."""

    terms: tuple
    slop: int = 0


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """SpanNear over term clauses (`queries/spans/SpanNearQuery.java`):
    docs with a window of the terms at width-minus-terms <= slop,
    strictly ordered when ``in_order``. Each element of ``terms`` is a
    term string, or a tuple of alternative terms for that slot (a
    SpanOr clause, `queries/spans/SpanOrQuery.java`). Evaluated via
    :func:`lucene_spark.search.spans.span_near_docs` /
    ``span_near_multi_docs`` (constant-score match semantics, like the
    span gates)."""

    terms: tuple
    slop: int = 0
    in_order: bool = True

    @property
    def slot_lists(self):
        """terms normalized to one list of alternatives per slot."""
        return [
            list(t) if isinstance(t, (tuple, list)) else [t]
            for t in self.terms
        ]

    @property
    def has_multi_slots(self) -> bool:
        return any(isinstance(t, (tuple, list)) for t in self.terms)


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """SpanNot (`queries/spans/SpanNotQuery.java:34-71`): include
    SpanNear matches with no exclude-term occurrence overlapping the
    span widened by ``pre`` tokens before / ``post`` after. Evaluated
    via :func:`lucene_spark.search.spans.span_not_docs`
    (constant-score match semantics)."""

    include: SpanNearQuery
    exclude_terms: tuple
    pre: int = 0
    post: int = 0


# --- rewrite ---------------------------------------------------------------


def rewrite(query: Query, terms_df: Optional[DataFrame] = None) -> Query:
    """Rewrite to fixpoint (`IndexSearcher.java:860-866`)."""
    prev = None
    while prev != query:
        prev = query
        query = _rewrite_once(query, terms_df)
    return query


def probe_term_set(q: MultiTermQuery, terms_df: DataFrame):
    """Bounded dictionary probe shared by every multi-term consumer
    (rewrite, complex phrases): collect at most cap+1 matching terms.

    Returns the matched list, or None when MORE than maxClauseCount
    matched (callers choose the distributed route or raise). The
    collect is BOUNDED at cap+1 rows regardless of dictionary size, so
    no caller ever ships an unbounded term list to the driver."""
    cap = _MAX_CLAUSE_COUNT
    matched = [
        r["term"]
        for r in terms_df.filter(q.term_filter())
        .select("term")
        .limit(cap + 1)
        .collect()
    ]
    return None if len(matched) > cap else matched


def _expand_terms(q: MultiTermQuery, terms_df: DataFrame) -> Query:
    """Multi-term rewrite with the maxClauseCount guard."""
    cap = _MAX_CLAUSE_COUNT
    matched = probe_term_set(q, terms_df)
    if matched is not None and not matched:
        return MatchNoDocsQuery("no matching terms")
    if matched is None:
        if q.rewrite_method in ("constant_score_boolean", "scoring_boolean"):
            raise TooManyClauses(
                f"multi-term query matched > {cap} terms under "
                f"{q.rewrite_method} rewrite (IndexSearcher.TooManyClauses); "
                "raise set_max_clause_count or use the default "
                "constant_score rewrite"
            )
        return ConstantScoreQuery(MultiTermFilterDocsQuery(q))
    inner = BooleanQuery(
        tuple(BooleanClause(TermQuery(t), Occur.SHOULD) for t in sorted(matched))
    )
    if q.rewrite_method == "scoring_boolean":
        return inner
    return ConstantScoreQuery(inner)


def _rewrite_once(query: Query, terms_df: Optional[DataFrame]) -> Query:
    if isinstance(query, MultiTermQuery):
        if terms_df is None:
            raise ValueError("multi-term query rewrite needs the terms table")
        return _expand_terms(query, terms_df)
    if isinstance(query, BoostQuery):
        inner = _rewrite_once(query.query, terms_df)
        if isinstance(inner, BoostQuery):  # collapse nested boosts
            return BoostQuery(inner.query, query.boost * inner.boost)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        return BoostQuery(inner, query.boost)
    if isinstance(query, ConstantScoreQuery):
        inner = _rewrite_once(query.query, terms_df)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if isinstance(inner, ConstantScoreQuery):  # idempotent wrap
            inner = inner.query
        return ConstantScoreQuery(inner)
    if isinstance(query, DisjunctionMaxQuery):
        subs = [_rewrite_once(sub, terms_df) for sub in query.queries]
        subs = [sub for sub in subs if not isinstance(sub, MatchNoDocsQuery)]
        if not subs:
            return MatchNoDocsQuery("all disjuncts empty")
        if len(subs) == 1:  # DisjunctionMaxQuery.rewrite single-disjunct
            return subs[0]
        return DisjunctionMaxQuery(tuple(subs), query.tie_breaker)
    if isinstance(query, BooleanQuery):
        clauses = [
            BooleanClause(_rewrite_once(c.query, terms_df), c.occur) for c in query.clauses
        ]
        # drop MatchNoDocs SHOULD clauses; MatchNoDocs MUST/FILTER kills all
        kept = []
        for c in clauses:
            if isinstance(c.query, MatchNoDocsQuery):
                if c.occur in (Occur.MUST, Occur.FILTER):
                    return MatchNoDocsQuery("MUST clause matches nothing")
                continue  # SHOULD / MUST_NOT no-op
            kept.append(c)
        # dedup FILTER / MUST_NOT (BooleanQuery.java:283-305)
        seen, dedup = set(), []
        for c in kept:
            key = (c.occur, c.query) if c.occur in (Occur.FILTER, Occur.MUST_NOT) else None
            if key is not None and key in seen:
                continue
            if key is not None:
                seen.add(key)
            dedup.append(c)
        kept = dedup
        # MUST + MUST_NOT of the same query → MatchNoDocs (:340-354)
        musts = {c.query for c in kept if c.occur in (Occur.MUST, Occur.FILTER)}
        for c in kept:
            if c.occur == Occur.MUST_NOT and c.query in musts:
                return MatchNoDocsQuery("MUST and MUST_NOT of same query")
        # single positive scoring clause unwrap (:240-265)
        if (
            len(kept) == 1
            and kept[0].occur in (Occur.SHOULD, Occur.MUST)
            and query.minimum_number_should_match <= 1
        ):
            return kept[0].query
        if not kept:
            return MatchNoDocsQuery("empty boolean")
        return BooleanQuery(tuple(kept), query.minimum_number_should_match)
    return query
