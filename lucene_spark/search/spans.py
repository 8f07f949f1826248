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

__all__ = [
    "span_near_docs",
    "span_near_multi_docs",
    "span_not_docs",
    "span_first_docs",
    "span_position_range_docs",
    "term_or_spans",
    "span_or",
    "span_or_docs",
    "span_near_over",
    "span_containing_docs",
    "span_within_docs",
]


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
    if not terms:
        raise ValueError("span_near needs >= 1 clause")
    if len(terms) == 1:
        # degenerate single-clause SpanNear ≡ the clause's term spans
        # (the reference accepts one-clause SpanNearQuery)
        return _live(
            index, decode_positions(index, [terms[0]]).select("doc_id").distinct()
        )
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
        # any order, overlap permitted: NearSpansUnordered.atMatch
        # (NearSpansUnordered.java:83-85) checks only
        # maxEnd − minStart − totalLength <= slop — duplicate clauses
        # sitting on the same position match (width goes negative)
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
    if not slot_terms:
        raise ValueError("span_near needs >= 1 clause")
    if len(slot_terms) == 1:
        # degenerate single-slot SpanNear ≡ the slot's term-match set
        if not slot_terms[0]:
            return index.spark.createDataFrame([], "doc_id long")
        return _live(
            index,
            decode_positions(index, list(slot_terms[0])).select("doc_id").distinct(),
        )
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


# --------------------------------------------------------------------------
# general span algebra (round 4): every combinator consumes and produces
# a *span frame* — DataFrame(doc_id, start, end), end exclusive — so
# SpanOr / SpanNear / SpanContaining / SpanWithin compose arbitrarily,
# the way the reference composes SpanQuery trees
# (`queries/spans/SpanOrQuery.java:38`, `SpanContainQuery.java:30`,
# `SpanContainingQuery.java:33`, `SpanWithinQuery.java:33`).
#
# FieldMaskingSpanQuery (`queries/spans/FieldMaskingSpanQuery.java:59`)
# falls out structurally: a span frame carries only (doc_id, start,
# end), so frames decoded from DIFFERENT single-field indexes over the
# same doc ids compose in one span_near_over/span_containing_docs call
# — which is exactly the reference's trick of lying about the field so
# SpanNear accepts clauses from two fields (tested in
# tests/test_span_algebra.py::test_field_masking_cross_index).


def term_spans(index: InvertedIndex, term: str) -> DataFrame:
    """Span frame of one SpanTermQuery: each occurrence is the width-1
    span [p, p+1)."""
    return term_or_spans(index, [term])


def term_or_spans(index: InvertedIndex, terms: List[str]) -> DataFrame:
    """Span frame of SpanOr(SpanTerm(t) for t in terms) — one decode
    over the union of the terms' blocks (``decode_positions`` already
    takes a term list), positions exploded to width-1 spans."""
    if not terms:
        raise ValueError("term_or_spans needs >= 1 term")
    return decode_positions(index, list(dict.fromkeys(terms))).select(
        "doc_id",
        F.explode("positions").alias("start"),
    ).withColumn("end", F.col("start") + 1)


def span_or(span_frames: List[DataFrame]) -> DataFrame:
    """SpanOrQuery (`queries/spans/SpanOrQuery.java:38`): the union of
    the clause span enumerations. Duplicate (doc, start, end) spans
    from different clauses collapse — OrSpans advances by position, a
    span is emitted once."""
    if not span_frames:
        raise ValueError("span_or needs >= 1 clause")
    out = span_frames[0]
    for s in span_frames[1:]:
        out = out.unionByName(s)
    return out.distinct()


def span_or_docs(index: InvertedIndex, span_frames: List[DataFrame]) -> DataFrame:
    """Match set of a top-level SpanOrQuery."""
    return _live(index, span_or(span_frames).select("doc_id").distinct())


def span_near_over(
    span_frames: List[DataFrame], slop: int, in_order: bool
) -> DataFrame:
    """SpanNear over arbitrary sub-span frames → the match-window span
    frame (doc_id, start, end).

    Ordered (`spans/NearSpansOrdered.java`): clause spans strictly in
    order and non-overlapping (prev.end <= cur.start), total
    intervening gap Σ (cur.start − prev.end) <= slop. For width-1 term
    spans this reduces to the (pn − p1 + 1 − n) <= slop formula of
    :func:`span_near_docs` (gap_i = p_{i+1} − p_i − 1).

    Unordered (`spans/NearSpansUnordered.java:83-85` atMatch): one
    span per clause, covering width minus total span length <= slop:
    (max end − min start) − Σ (end_i − start_i) <= slop. Overlapping
    clause spans are PERMITTED (the reference checks only the width
    arithmetic, which goes negative on overlap and so always passes).

    Physical plan: doc-equi-joins (one shuffle key: doc_id) with the
    position inequalities as codegen'd join residuals — identical
    shape to the width-1 path, just on (start, end) pairs.
    """
    n = len(span_frames)
    if n == 0:
        raise ValueError("span_near needs >= 1 clause")
    aliased = [
        s.select(
            "doc_id",
            F.col("start").alias(f"s{i}"),
            F.col("end").alias(f"e{i}"),
        )
        for i, s in enumerate(span_frames)
    ]
    if n == 1:
        return aliased[0].select(
            "doc_id", F.col("s0").alias("start"), F.col("e0").alias("end")
        )
    joined = aliased[0]
    for i in range(1, n):
        joined = joined.join(aliased[i], "doc_id")
        if in_order:
            # in order AND non-overlapping
            joined = joined.filter(F.col(f"s{i}") >= F.col(f"e{i-1}"))
    scols = [F.col(f"s{i}") for i in range(n)]
    ecols = [F.col(f"e{i}") for i in range(n)]
    if in_order:
        gap = sum(
            (scols[i] - ecols[i - 1] for i in range(1, n)), F.lit(0)
        )
        start, end = scols[0], ecols[-1]
    else:
        start, end = F.least(*scols), F.greatest(*ecols)
        total_len = sum((ecols[i] - scols[i] for i in range(n)), F.lit(0))
        gap = end - start - total_len
    return (
        joined.filter(gap <= slop)
        .select("doc_id", start.alias("start"), end.alias("end"))
        .distinct()
    )


def span_containing_docs(
    index: InvertedIndex, big: DataFrame, little: DataFrame
) -> DataFrame:
    """SpanContainingQuery (`queries/spans/SpanContainingQuery.java:33`):
    match set of BIG spans that contain at least one LITTLE span
    (big.start <= little.start AND little.end <= big.end, same doc).

    Plan: LEFT SEMI join on doc_id with the containment range as a
    codegen residual — big spans stream through, little spans hash on
    doc, nothing materializes beyond the survivors."""
    lit = little.select(
        F.col("doc_id").alias("l_doc"),
        F.col("start").alias("l_start"),
        F.col("end").alias("l_end"),
    )
    cond = (
        (F.col("doc_id") == F.col("l_doc"))
        & (F.col("start") <= F.col("l_start"))
        & (F.col("l_end") <= F.col("end"))
    )
    return _live(index, big.join(lit, cond, "left_semi").select("doc_id").distinct())


def span_within_docs(
    index: InvertedIndex, big: DataFrame, little: DataFrame
) -> DataFrame:
    """SpanWithinQuery (`queries/spans/SpanWithinQuery.java:33`): match
    set of LITTLE spans enclosed by a BIG span. Same containment
    predicate as :func:`span_containing_docs` with the semi-join
    direction flipped (the reference returns little's spans; the doc
    match sets coincide, the enumerated spans differ)."""
    bg = big.select(
        F.col("doc_id").alias("b_doc"),
        F.col("start").alias("b_start"),
        F.col("end").alias("b_end"),
    )
    cond = (
        (F.col("doc_id") == F.col("b_doc"))
        & (F.col("b_start") <= F.col("start"))
        & (F.col("end") <= F.col("b_end"))
    )
    return _live(
        index, little.join(bg, cond, "left_semi").select("doc_id").distinct()
    )


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
