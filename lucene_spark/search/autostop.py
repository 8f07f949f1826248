"""QueryAutoStopWordAnalyzer analog — index-derived query-time stopwords.

Reference: `lucene/analysis/common/src/java/org/apache/lucene/analysis/
query/QueryAutoStopWordAnalyzer.java:51` — wraps a delegate analyzer and,
from an ``IndexReader``, marks every term whose docFreq exceeds
``maxDocFreq`` (or ``numDocs * maxPercentDocs``, default 40%,
`QueryAutoStopWordAnalyzer.java:57`) as a query-time stopword.  The
index itself is untouched; only query analysis drops the terms.

Spark shape
-----------
The stop set is one partial-agg'd filter over the terms-table metadata
(``doc_freq`` is already a per-term aggregate — no posting decode, no
extra shuffle).  Its size is bounded by construction: at most
``sum(doc_freq) / maxDocFreq <= avg_dl / maxPercentDocs`` terms can
each appear in more than ``maxPercentDocs`` of docs, so collecting it
to the driver (for query rewriting) is O(avg doc length) — a few dozen
strings even at 10^12 docs — never O(vocabulary).
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

from pyspark.sql import DataFrame, functions as F

from ..index.builder import InvertedIndex

__all__ = [
    "DEFAULT_MAX_DOC_FREQ_PERCENT",
    "auto_stop_words",
    "auto_stop_word_set",
    "auto_stop_filter_boosts",
]

# QueryAutoStopWordAnalyzer.defaultMaxDocFreqPercent
DEFAULT_MAX_DOC_FREQ_PERCENT = 0.4


def _threshold(
    index: InvertedIndex,
    max_doc_freq: Optional[int],
    max_percent_docs: Optional[float],
) -> int:
    """The docFreq above which a term is a stopword.

    Mirrors the ctor chain: the percent form delegates to the int form
    via ``(int) (indexReader.numDocs() * maxPercentDocs)``
    (`QueryAutoStopWordAnalyzer.java:115`); terms stop when docFreq is
    STRICTLY greater (`maxDocFreq`-named but exclusive, java:142).
    """
    if max_doc_freq is not None and max_percent_docs is not None:
        raise ValueError("pass max_doc_freq OR max_percent_docs, not both")
    if max_doc_freq is not None:
        return int(max_doc_freq)
    pct = (
        DEFAULT_MAX_DOC_FREQ_PERCENT if max_percent_docs is None else max_percent_docs
    )
    return int(index.num_docs * pct)


def auto_stop_words(
    index: InvertedIndex,
    max_doc_freq: Optional[int] = None,
    max_percent_docs: Optional[float] = None,
) -> DataFrame:
    """The derived stop set as a DataFrame (term, doc_freq), docFreq
    desc / term asc — the ``getStopWords()`` surface
    (`QueryAutoStopWordAnalyzer.java:170`)."""
    thr = _threshold(index, max_doc_freq, max_percent_docs)
    return (
        index.terms.filter(F.col("doc_freq") > thr)
        .select("term", "doc_freq")
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
    )


def auto_stop_word_set(
    index: InvertedIndex,
    max_doc_freq: Optional[int] = None,
    max_percent_docs: Optional[float] = None,
) -> set:
    """Collected stop set (bounded: <= avg_dl / percent terms)."""
    return {r["term"] for r in auto_stop_words(index, max_doc_freq, max_percent_docs).collect()}


def auto_stop_filter_boosts(
    index: InvertedIndex,
    term_boosts: Dict[str, float],
    max_doc_freq: Optional[int] = None,
    max_percent_docs: Optional[float] = None,
) -> Dict[str, float]:
    """Query-time filtering: drop the auto-stopped terms from a query's
    term→boost map (the wrapped analyzer's StopFilter step,
    `QueryAutoStopWordAnalyzer.java:158-166`).  Only the QUERY's own
    terms are checked — one k-row ``isin`` filter on the terms table,
    never a full stop-set materialization."""
    thr = _threshold(index, max_doc_freq, max_percent_docs)
    stopped = {
        r["term"]
        for r in index.terms.filter(
            F.col("term").isin(list(term_boosts)) & (F.col("doc_freq") > thr)
        )
        .select("term")
        .collect()
    }
    return {t: b for t, b in term_boosts.items() if t not in stopped}
