"""Span queries: proximity beyond PhraseQuery.

Re-expression of the span family
(`lucene/queries/src/java/org/apache/lucene/queries/spans/SpanNearQuery.java:47-85`,
`spans/NearSpansOrdered.java:31-60`, `spans/NearSpansUnordered.java`,
`spans/SpanFirstQuery.java`), for term sub-spans (each term occurrence
is a width-1 span [p, p+1)):

- **ordered** SpanNear: occurrences at strictly increasing positions
  p1 < p2 < ... < pn with total gap (pn - p1 + 1 - n) <= slop — the
  ordered matcher's "non-overlapping, in order, within slop".
- **unordered** SpanNear: n DISTINCT positions (one per clause, any
  order) whose covering span satisfies (max - min + 1 - n) <= slop.
- **SpanFirst**: a term occurrence whose span ends within the first
  ``end`` positions (p + 1 <= end).

Physical plan: per-term positions decode (the same .pos stream the
phrase path uses) → explode → doc-equi-join with position inequality
filters. Each join is keyed on doc_id, so Spark shuffles once per
clause on the doc key and the inequality predicates evaluate inside
codegen — positions per (doc, term) are tiny, so the theta part of the
join never blows up. No Python in the matching path.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.positional import decode_positions

__all__ = ["span_near_docs", "span_near_multi_docs", "span_not_docs", "span_first_docs", "span_position_range_docs"]


def _live(index: InvertedIndex, docs: DataFrame) -> DataFrame:
    """Drop tombstoned docs (same anti-join as IndexSearcher._live)."""
    hidden = index.hidden_docs
    if hidden is None:
        return docs
    return docs.join(hidden, "doc_id", "left_anti")


def _slots(index: InvertedIndex, terms: List[str]) -> List[DataFrame]:
    """One (doc_id, p{i}) frame per clause, in clause order.

    Decodes per UNIQUE term (repeated clauses share one decode plan),
    so each decode only reads that term's blocks — no persist needed,
    nothing left cached after the query (the r2 advice leak)."""
    decoded = {t: decode_positions(index, [t]) for t in set(terms)}
    return [
        decoded[t].select("doc_id", F.explode("positions").alias(f"p{i}"))
        for i, t in enumerate(terms)
    ]


def span_near_docs(
    index: InvertedIndex, terms: List[str], slop: int, in_order: bool
) -> DataFrame:
    """DataFrame(doc_id) of docs with a SpanNear match (constant score —
    span scoring uses sloppyFreq like phrases; the match set is the
    span semantics the gate verifies)."""
    if len(terms) < 2:
        raise ValueError("span_near needs >= 2 clauses")
    slots = _slots(index, terms)
    n = len(terms)
    joined = slots[0]
    for i in range(1, n):
        joined = joined.join(slots[i], "doc_id")
        if in_order:
            # strictly increasing, non-overlapping width-1 spans
            joined = joined.filter(F.col(f"p{i}") > F.col(f"p{i-1}"))
    pcols = [F.col(f"p{i}") for i in range(n)]
    if in_order:
        width = pcols[-1] - pcols[0] + 1 - n
    else:
        # distinct positions per clause (spans must not overlap), any order
        for i in range(n):
            for j in range(i + 1, n):
                joined = joined.filter(pcols[i] != pcols[j])
        width = F.greatest(*pcols) - F.least(*pcols) + 1 - n
    return _live(index, joined.filter(width <= slop).select("doc_id").distinct())


def span_near_multi_docs(
    index: InvertedIndex,
    slot_terms: List[List[str]],
    slop: int,
    in_order: bool,
) -> DataFrame:
    """SpanNear over multi-term slots — each slot is a SpanOr of
    SpanTermQueries (the shape `ComplexPhraseQueryParser` rewrites
    wildcard/fuzzy/alternation phrase elements into). A slot's
    positions frame is the union of its terms' decoded positions; the
    near-join itself is identical to :func:`span_near_docs`."""
    if len(slot_terms) < 2:
        raise ValueError("span_near needs >= 2 clauses")
    n = len(slot_terms)
    slots = []
    for i, terms in enumerate(slot_terms):
        if not terms:
            # a slot with no matching terms ⇒ no spans at all
            return index.spark.createDataFrame([], "doc_id long")
        slots.append(
            decode_positions(index, list(terms)).select(
                "doc_id", F.explode("positions").alias(f"p{i}")
            )
        )
    joined = slots[0]
    for i in range(1, n):
        joined = joined.join(slots[i], "doc_id")
        if in_order:
            joined = joined.filter(F.col(f"p{i}") > F.col(f"p{i-1}"))
    pcols = [F.col(f"p{i}") for i in range(n)]
    if in_order:
        width = pcols[-1] - pcols[0] + 1 - n
    else:
        for i in range(n):
            for j in range(i + 1, n):
                joined = joined.filter(pcols[i] != pcols[j])
        width = F.greatest(*pcols) - F.least(*pcols) + 1 - n
    return _live(index, joined.filter(width <= slop).select("doc_id").distinct())


def _near_match_windows(
    index: InvertedIndex, slot_terms: List[List[str]], slop: int, in_order: bool
) -> Optional[DataFrame]:
    """(doc_id, start, end) of every SpanNear match window — the span
    positions SpanNotQuery needs (end is exclusive, Lucene's span
    convention). None when a slot has no matching terms."""
    n = len(slot_terms)
    slots = []
    for i, terms in enumerate(slot_terms):
        if not terms:
            return None
        slots.append(
            decode_positions(index, list(terms)).select(
                "doc_id", F.explode("positions").alias(f"p{i}")
            )
        )
    if n == 1:
        return slots[0].select(
            "doc_id",
            F.col("p0").alias("start"),
            (F.col("p0") + 1).alias("end"),
        )
    joined = slots[0]
    for i in range(1, n):
        joined = joined.join(slots[i], "doc_id")
        if in_order:
            joined = joined.filter(F.col(f"p{i}") > F.col(f"p{i-1}"))
    pcols = [F.col(f"p{i}") for i in range(n)]
    if in_order:
        start, top = pcols[0], pcols[-1]
    else:
        for i in range(n):
            for j in range(i + 1, n):
                joined = joined.filter(pcols[i] != pcols[j])
        start, top = F.least(*pcols), F.greatest(*pcols)
    width = top - start + 1 - n
    return joined.filter(width <= slop).select(
        "doc_id", start.alias("start"), (top + 1).alias("end")
    )


def span_not_docs(
    index: InvertedIndex,
    include_slots: List[List[str]],
    exclude_terms: List[str],
    slop: int = 0,
    in_order: bool = True,
    pre: int = 0,
    post: int = 0,
) -> DataFrame:
    """SpanNotQuery (`queries/spans/SpanNotQuery.java:34-71`): docs
    with an include SpanNear match that does NOT overlap any exclude
    term occurrence within ``pre`` tokens before or ``post`` tokens
    after the include span (negative pre/post permit partial overlap,
    as in the reference).

    Plan: include windows (doc_id, start, end) left-anti-joined
    against exploded exclude positions on doc_id plus the overlap
    range predicate — Catalyst extracts the doc_id equi-key, so the
    join hashes on docs and the range test runs in codegen.
    """
    inc = _near_match_windows(index, include_slots, slop, in_order)
    if inc is None:
        return index.spark.createDataFrame([], "doc_id long")
    exc = (
        decode_positions(index, list(set(exclude_terms)))
        .select("doc_id", F.explode("positions").alias("pe"))
        .withColumnRenamed("doc_id", "e_doc")
    )
    # width-1 exclude span [pe, pe+1) overlaps the widened include
    # window [start - pre, end + post) iff pe >= start - pre - 0 is
    # wrong at the left edge: overlap requires pe + 1 > start - pre
    # and pe < end + post
    cond = (
        (F.col("e_doc") == F.col("doc_id"))
        & (F.col("pe") + 1 > F.col("start") - F.lit(int(pre)))
        & (F.col("pe") < F.col("end") + F.lit(int(post)))
    )
    survivors = inc.join(exc, cond, "left_anti")
    return _live(index, survivors.select("doc_id").distinct())


def span_first_docs(index: InvertedIndex, term: str, end: int) -> DataFrame:
    """Docs where `term` occurs within the first `end` positions
    (`SpanFirstQuery`: span.end <= end; width-1 span ⇒ p + 1 <= end)."""
    return span_position_range_docs(index, term, 0, end)


def span_position_range_docs(
    index: InvertedIndex, term: str, start: int, end: int
) -> DataFrame:
    """Docs where `term` occurs inside the position window
    (`queries/spans/SpanPositionRangeQuery.java`: span.start >= start
    AND span.end <= end; SpanFirst is the start=0 special case)."""
    return _live(
        index,
        decode_positions(index, [term])
        .select("doc_id", F.explode("positions").alias("p"))
        .filter((F.col("p") >= int(start)) & (F.col("p") + 1 <= int(end)))
        .select("doc_id")
        .distinct(),
    )
