"""Damerau-Levenshtein edit distance (transpositions count 1).

Lucene's FuzzyQuery defaults to ``transpositions=true``
(`lucene/core/src/java/org/apache/lucene/search/FuzzyQuery.java:78-103`),
so "teh"~1 matches "the". This is the full (unrestricted) variant —
the one DuckDB's ``damerau_levenshtein`` computes (checked:
dl("ca","abc") = 2) — so the gate oracle and the engine agree even on
the pathological cases where the restricted/OSA variant differs.

Spark has no built-in, so the distance runs in an Arrow-batched pandas
UDF — but ONLY over the term dictionary during multi-term rewrite
(vocabulary-sized, not corpus-sized), the same place Lucene walks its
FST with a Levenshtein automaton.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

__all__ = ["damerau_levenshtein", "damerau_within_udf"]


def damerau_levenshtein(a: str, b: str) -> int:
    """Full Damerau-Levenshtein (adjacent transposition = 1 edit,
    edited substrings may be edited again)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    # (la+2) x (lb+2) table with the -inf guard row/col of the classic
    # alphabet-indexed algorithm
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    da: dict = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[k][l] + (i - 1 - k) + 1 + (j - 1 - l),  # transpose
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def damerau_within_udf(query_term: str, max_edits: int):
    """pandas_udf: term column → boolean (DL distance <= max_edits)."""

    @F.pandas_udf("boolean")
    def _within(s: pd.Series) -> pd.Series:
        return s.map(lambda t: damerau_levenshtein(t, query_term) <= max_edits)

    return _within
