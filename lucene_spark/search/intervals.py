"""Minimal-interval queries (`lucene/queries/src/java/org/apache/lucene/queries/intervals/`).

The intervals API is Lucene's modern proximity algebra (Clarke &
Cormack's GC-lists): every source yields, per doc, the set of MINIMAL
intervals — no returned interval properly contains another — and
combinators compose sources:

- :func:`term` — [p, p] per occurrence;
- :func:`ordered` — sub-intervals in order, non-overlapping
  (`OrderedIntervalsSource`); :func:`phrase` = ordered with zero gaps;
- :func:`unordered` — any order, non-overlapping
  (`UnorderedIntervalsSource`);
- :func:`i_or` — union (`DisjunctionIntervalsSource`);
- :func:`max_gaps` / :func:`max_width` — filters on the interval's
  internal gap count / total width (`FilteredIntervalsSource`);
- :func:`containing` / :func:`contained_by` — relational filters
  (`ContainingIntervalsSource` etc.).

Minimality is what distinguishes intervals from spans: e.g. for
``ordered(a, b)`` on positions a@[0, 2], b@[5], the interval [2, 5]
is returned but [0, 5] is not (it contains [2, 5]) — so a nested
``max_width(3, ...)`` sees only the tight match.

Physical plan: per-term positions decode (the shared .pos machinery) →
one Arrow-batched kernel per doc evaluating the combinator tree over
numpy position lists (position lists per doc are tiny; everything
across docs stays data-parallel).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.positional import decode_positions

__all__ = [
    "term",
    "ordered",
    "unordered",
    "phrase",
    "i_or",
    "max_gaps",
    "max_width",
    "containing",
    "contained_by",
    "before",
    "after",
    "overlapping",
    "not_containing",
    "not_contained_by",
    "extend",
    "interval_matches",
]


class IntervalsSource:
    def terms(self) -> List[str]:
        raise NotImplementedError


@dataclass(frozen=True)
class _Term(IntervalsSource):
    t: str

    def terms(self):
        return [self.t]


@dataclass(frozen=True)
class _Combi(IntervalsSource):
    kind: str  # ordered | unordered | or
    subs: tuple

    def terms(self):
        return [t for s in self.subs for t in s.terms()]


@dataclass(frozen=True)
class _Filtered(IntervalsSource):
    kind: str  # max_gaps | max_width
    n: int
    sub: IntervalsSource

    def terms(self):
        return self.sub.terms()


@dataclass(frozen=True)
class _Relational(IntervalsSource):
    kind: str  # containing | contained_by
    big: IntervalsSource
    small: IntervalsSource

    def terms(self):
        return self.big.terms() + self.small.terms()


def term(t: str) -> IntervalsSource:
    return _Term(t)


def ordered(*subs: IntervalsSource) -> IntervalsSource:
    return _Combi("ordered", tuple(subs))


def unordered(*subs: IntervalsSource) -> IntervalsSource:
    return _Combi("unordered", tuple(subs))


def i_or(*subs: IntervalsSource) -> IntervalsSource:
    return _Combi("or", tuple(subs))


def phrase(*terms_: str) -> IntervalsSource:
    return max_gaps(0, ordered(*[term(t) for t in terms_]))


def max_gaps(n: int, sub: IntervalsSource) -> IntervalsSource:
    return _Filtered("max_gaps", n, sub)


def max_width(n: int, sub: IntervalsSource) -> IntervalsSource:
    return _Filtered("max_width", n, sub)


def containing(big: IntervalsSource, small: IntervalsSource) -> IntervalsSource:
    return _Relational("containing", big, small)


def before(src: IntervalsSource, reference: IntervalsSource) -> IntervalsSource:
    """Intervals of `src` ending before some `reference` interval
    begins (`Intervals.before`)."""
    return _Relational("before", reference, src)


def after(src: IntervalsSource, reference: IntervalsSource) -> IntervalsSource:
    """Intervals of `src` starting after some `reference` interval
    ends (`Intervals.after`)."""
    return _Relational("after", reference, src)


def overlapping(src: IntervalsSource, reference: IntervalsSource) -> IntervalsSource:
    """Intervals of `src` overlapping some `reference` interval
    (`Intervals.overlapping`)."""
    return _Relational("overlapping", reference, src)


def not_containing(minuend: IntervalsSource, subtrahend: IntervalsSource) -> IntervalsSource:
    """Intervals of `minuend` that do NOT contain any `subtrahend`
    interval (`Intervals.notContaining`)."""
    return _Relational("not_containing", minuend, subtrahend)


def not_contained_by(minuend: IntervalsSource, subtrahend: IntervalsSource) -> IntervalsSource:
    """Intervals of `minuend` not lying inside any `subtrahend`
    interval (`Intervals.notContainedBy`)."""
    return _Relational("not_contained_by", subtrahend, minuend)


@dataclass(frozen=True)
class _Extended(IntervalsSource):
    sub: IntervalsSource
    n_before: int
    n_after: int

    def terms(self):
        return self.sub.terms()


def extend(src: IntervalsSource, n_before: int, n_after: int) -> IntervalsSource:
    """Widen each interval by `n_before`/`n_after` positions, clamped
    at 0 (`Intervals.extend` / ExtendedIntervalsSource) — lets a
    nested filter see context around the match."""
    return _Extended(src, n_before, n_after)


def contained_by(small: IntervalsSource, big: IntervalsSource) -> IntervalsSource:
    return _Relational("contained_by", big, small)


# --- per-doc evaluation -----------------------------------------------------

# an interval witness: (start, end, tokens) — tokens = leaf positions
# covered by this witness, so gaps = width - tokens is exact even when
# an or-branch chooses sub-sources of different widths
Iv = Tuple[int, int, int]


def _minimize(ivs: List[Iv]) -> List[Iv]:
    """Per (start, end) keep the max-token witness (fewest gaps), then
    drop intervals properly containing another; sort by (start, end)."""
    best: dict = {}
    for s, e, tok in ivs:
        if (s, e) not in best or tok > best[(s, e)]:
            best[(s, e)] = tok
    spans = sorted(best)
    out: List[Iv] = []
    for s, e in spans:
        if any(s <= s2 and e2 <= e and (s2, e2) != (s, e) for s2, e2 in spans):
            continue
        out.append((s, e, best[(s, e)]))
    return out


def _eval_source(src: IntervalsSource, pos: dict) -> List[Iv]:
    """Minimal intervals of `src` for one doc. `pos`: term → sorted
    positions (np array). Direct enumeration + minimize — the
    reference-style evaluation; position lists per doc are tiny."""
    if isinstance(src, _Term):
        ps = pos.get(src.t)
        return [(int(p), int(p), 1) for p in ps] if ps is not None else []
    if isinstance(src, _Combi):
        subs = [_eval_source(s, pos) for s in src.subs]
        if src.kind == "or":
            return _minimize([iv for l in subs for iv in l])
        if any(not l for l in subs):
            return []
        out: List[Iv] = []
        if src.kind == "ordered":

            def rec(i: int, prev_end: int, start: int, toks: int) -> None:
                if i == len(subs):
                    out.append((start, prev_end, toks))
                    return
                for s, e, tok in subs[i]:
                    if s > prev_end:
                        rec(i + 1, e, s if i == 0 else start, toks + tok)

            rec(0, -1, 0, 0)
        else:  # unordered: one interval per sub, pairwise non-overlapping

            def rec_u(i: int, chosen: List[Iv]) -> None:
                if i == len(subs):
                    out.append(
                        (
                            min(s for s, _, _ in chosen),
                            max(e for _, e, _ in chosen),
                            sum(t for _, _, t in chosen),
                        )
                    )
                    return
                for s, e, tok in subs[i]:
                    if all(e < s2 or e2 < s for s2, e2, _ in chosen):
                        rec_u(i + 1, chosen + [(s, e, tok)])

            rec_u(0, [])
        return _minimize(out)
    if isinstance(src, _Filtered):
        ivs = _eval_source(src.sub, pos)
        if src.kind == "max_width":
            return [iv for iv in ivs if iv[1] - iv[0] + 1 <= src.n]
        return [iv for iv in ivs if (iv[1] - iv[0] + 1 - iv[2]) <= src.n]
    if isinstance(src, _Extended):
        ivs = _eval_source(src.sub, pos)
        return _minimize(
            [(max(0, s - src.n_before), e + src.n_after, t) for s, e, t in ivs]
        )
    if isinstance(src, _Relational):
        big = _eval_source(src.big, pos)
        small = _eval_source(src.small, pos)
        if src.kind == "containing":
            return [
                iv for iv in big if any(iv[0] <= s and e <= iv[1] for s, e, _ in small)
            ]
        if src.kind == "before":
            # big = reference; keep small intervals ending before some ref
            return [iv for iv in small if any(iv[1] < s for s, _, _ in big)]
        if src.kind == "after":
            return [iv for iv in small if any(iv[0] > e for _, e, _ in big)]
        if src.kind == "overlapping":
            return [
                iv
                for iv in small
                if any(iv[0] <= e and s <= iv[1] for s, e, _ in big)
            ]
        if src.kind == "not_containing":
            # big = minuend, small = subtrahend
            return [
                iv
                for iv in big
                if not any(iv[0] <= s and e <= iv[1] for s, e, _ in small)
            ]
        if src.kind == "not_contained_by":
            # big = subtrahend, small = minuend
            return [
                iv
                for iv in small
                if not any(s <= iv[0] and iv[1] <= e for s, e, _ in big)
            ]
        return [  # contained_by: small intervals inside some big one
            iv for iv in small if any(s <= iv[0] and iv[1] <= e for s, e, _ in big)
        ]
    raise NotImplementedError(type(src).__name__)


_IV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_intervals", T.IntegerType(), False),
        T.StructField("first_start", T.IntegerType(), False),
        T.StructField("last_end", T.IntegerType(), False),
    ]
)


def interval_matches(index: InvertedIndex, src: IntervalsSource) -> DataFrame:
    """DataFrame(doc_id, n_intervals, first_start, last_end) for docs
    with ≥1 minimal interval of `src`."""
    terms_ = sorted(set(src.terms()))
    decoded = decode_positions(index, terms_)
    per_doc = (
        decoded.groupBy("doc_id")
        .agg(
            F.collect_list("term").alias("ts"),
            F.collect_list("positions").alias("ps"),
        )
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc, ts, ps in zip(
                pdf["doc_id"].values, pdf["ts"].values, pdf["ps"].values
            ):
                pos = {t: np.asarray(p, dtype=np.int64) for t, p in zip(ts, ps)}
                ivs = _eval_source(src, pos)
                if ivs:
                    rows.append(
                        {
                            "doc_id": int(doc),
                            "n_intervals": len(ivs),
                            "first_start": int(ivs[0][0]),
                            "last_end": int(ivs[-1][1]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_intervals", "first_start", "last_end"],
            )

    out = per_doc.mapInPandas(fn, _IV_SCHEMA)
    hidden = index.hidden_docs
    if hidden is not None:
        out = out.join(hidden, "doc_id", "left_anti")
    return out
