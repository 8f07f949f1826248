"""Dictionary compound-word decompounding — the
DictionaryCompoundWordTokenFilter analog.

Re-expresses
`lucene/analysis/common/src/java/org/apache/lucene/analysis/compound/DictionaryCompoundWordTokenFilter.java:43`
(base semantics in `CompoundWordTokenFilterBase.java`): German-style
compounds like ``Rindfleischüberwachungsgesetz`` emit their dictionary
subwords at the SAME position as the original token (posIncrement 0),
original kept first. Matching is case-insensitive (the reference's
``CharArraySet(ignoreCase=true)``); the emitted subword is the
original-case substring of the token. Faithful knobs:

- ``min_word_size`` (default 5): shorter tokens pass through whole.
- ``min_subword_size``/``max_subword_size`` (2/15): candidate window.
- ``only_longest_match``: keep only the longest match per start
  offset (`DictionaryCompoundWordTokenFilter.java:84`).
- ``no_subwords``: the reference's ``onlyLongestMatchIgnoreSubwords``
  — after a longest match, scanning resumes AFTER it, so contained
  subwords are suppressed (`:100` ``i += longestMatchToken.txt.length() - 1``).

The hyphenation-grammar variant (``HyphenationCompoundWordTokenFilter``,
which needs the compiled TeX hyphenation trees) is NOT claimed; the
dictionary variant is the one production German/Dutch/Scandinavian
search actually configures with a wordlist.

Scale shape: a per-token pure function in the Arrow analysis stage,
dictionary broadcast by closure capture — no shuffle, no extra stage.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import pandas as pd

__all__ = ["decompound", "decompound_udf"]


def decompound(
    token: str,
    dictionary: frozenset,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
    no_subwords: bool = False,
) -> List[str]:
    """[original] + subwords in the reference's scan order."""
    out = [token]
    if len(token) < min_word_size:
        return out
    lower = token.lower()
    n = len(token)
    only_longest = only_longest_match or no_subwords
    i = 0
    while i <= n - min_subword_size:
        longest = None
        for j in range(min_subword_size, max_subword_size + 1):
            if i + j > n:
                break
            if lower[i:i + j] in dictionary:
                if only_longest:
                    if longest is None or longest[1] < j:
                        longest = (i, j)
                else:
                    out.append(token[i:i + j])
        if longest is not None:
            out.append(token[longest[0]:longest[0] + longest[1]])
            if no_subwords:
                i += longest[1] - 1
        i += 1
    return out


def decompound_udf(
    words: Sequence[str],
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
    no_subwords: bool = False,
):
    """Arrow-batched UDF: string token → array<string> of
    [original, subword...]."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    d = frozenset(w.lower() for w in words)

    @F.pandas_udf(ArrayType(StringType()))
    def _dec(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in it:
            yield ser.map(
                lambda t: decompound(
                    t, d, min_word_size, min_subword_size,
                    max_subword_size, only_longest_match, no_subwords,
                )
                if isinstance(t, str)
                else []
            )

    return _dec
