"""StringDistance family — spell-suggestion similarity measures.

References: `lucene/suggest/src/java/org/apache/lucene/search/spell/
LevenshteinDistance.java:29` (1 − edits/max(len)),
`LuceneLevenshteinDistance.java:33` (codepoint Damerau with the
1 − d/MIN(len) normalization — similarities can go NEGATIVE, and the
empty-string branch returns raw distances, both mirrored verbatim),
`JaroWinklerDistance.java:30` (half-window matches, transpositions/2,
Winkler prefix bonus above the 0.7 threshold),
`NGramDistance.java:33` (Chapman's sliding n-gram edit distance with
affixed null-prefix grams and discounted prefix matches), and
`HighFrequencyDictionary.java:31` (the spell dictionary = terms whose
docFreq clears a fraction of numDocs).

All distances are pure functions plus an Arrow-batched pair UDF for
corpus-scale scoring (no shuffle, memoized per distinct pair within a
batch).
"""

from __future__ import annotations

from typing import List

import pandas as pd

__all__ = [
    "levenshtein_similarity",
    "lucene_levenshtein_similarity",
    "jaro_winkler_similarity",
    "ngram_similarity",
    "string_distance_udf",
    "high_frequency_dictionary",
]


def levenshtein_similarity(target: str, other: str) -> float:
    """LevenshteinDistance.getDistance: 1 − edits / max(len)."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    prev = list(range(n + 1))
    for j in range(1, m + 1):
        cur = [j] + [0] * n
        tj = other[j - 1]
        for i in range(1, n + 1):
            cost = 0 if target[i - 1] == tj else 1
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + cost)
        prev = cur
    return 1.0 - prev[n] / max(m, n)


def lucene_levenshtein_similarity(target: str, other: str) -> float:
    """LuceneLevenshteinDistance.getDistance — mirrored verbatim
    including its quirks: codepoint alphabet, restricted Damerau
    transpositions, ``1 − d/min(len)`` (can be negative), and the
    empty-string branch returning RAW distances (java:46-52)."""
    t = [ord(c) for c in target]
    o = [ord(c) for c in other]
    n, m = len(t), len(o)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if t[i - 1] == o[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and t[i - 1] == o[j - 2] and t[i - 2] == o[j - 1]:
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return 1.0 - d[n][m] / min(m, n)


def jaro_winkler_similarity(
    s1: str, s2: str, threshold: float = 0.7
) -> float:
    """JaroWinklerDistance.getDistance (threshold 0.7 default; set it
    negative for plain Jaro)."""
    mx, mn = (s1, s2) if len(s1) > len(s2) else (s2, s1)
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(a != b for a, b in zip(ms1, ms2)) // 2
    prefix = 0
    for mi in range(len(mn)):
        if s1[mi] == s2[mi]:
            prefix += 1
        else:
            break
    m = float(matches)
    j = (m / len(s1) + m / len(s2) + (m - transpositions) / m) / 3
    if j < threshold:
        return j
    return j + min(0.1, 1.0 / len(mx)) * prefix * (1 - j)


def ngram_similarity(source: str, target: str, n: int = 2) -> float:
    """NGramDistance.getDistance (default bigrams): sliding n-gram
    edit distance with null-prefix padding and discounted prefix
    matches."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(
            1 for i in range(min(sl, tl)) if source[i] == target[i]
        )
        return cost / max(sl, tl)
    sa = ["\0"] * (n - 1) + list(source)
    prev = [float(i) for i in range(sl + 1)]
    for j in range(1, tl + 1):
        if j < n:
            t_j = ["\0"] * (n - j) + list(target[: j])
        else:
            t_j = list(target[j - n : j])
        cur = [float(j)] + [0.0] * sl
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":
                    tn -= 1  # discount matches on prefix
            ec = cost / tn
            cur[i] = min(cur[i - 1] + 1, prev[i] + 1, prev[i - 1] + ec)
        prev = cur
    return 1.0 - prev[sl] / max(tl, sl)


_DISTANCES = {
    "levenshtein": levenshtein_similarity,
    "lucene_levenshtein": lucene_levenshtein_similarity,
    "jaro_winkler": jaro_winkler_similarity,
    "ngram": ngram_similarity,
}


def string_distance_udf(kind: str):
    """(a, b) → similarity as an Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    try:
        fn = _DISTANCES[kind]
    except KeyError:
        raise ValueError(
            f"unknown distance {kind!r}; have {sorted(_DISTANCES)}"
        )

    @pandas_udf("double")
    def _dist(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(x or "", y or "") for x, y in zip(a, b)], dtype=float
        )

    return _dist


def high_frequency_dictionary(index, threshold: float):
    """HighFrequencyDictionary: terms with docFreq >= threshold ×
    numDocs — one metadata filter on the terms table."""
    from pyspark.sql import functions as F

    bar = threshold * index.num_docs
    return (
        index.terms.filter(F.col("doc_freq") >= bar)
        .select("term", "doc_freq")
        .orderBy(F.col("term").asc())
    )
