"""CharFilters and pattern tokenizers (MappingCharFilter /
PatternReplaceCharFilter / PatternTokenizer analogs).

Reference surfaces:

- `analysis/common/.../charfilter/MappingCharFilter.java:36` — a
  single left-to-right pass over the character stream replacing the
  LONGEST match from an FST of (input → output) rules; unmatched text
  is copied through.  (`NormalizeCharMap` builds the rule FST.)
- `analysis/common/.../pattern/PatternReplaceCharFilter.java:45` — a
  regex substitution applied to the char stream before tokenization.
- `analysis/common/.../pattern/PatternTokenizer.java:50` — a regex
  either SPLITS the text (group == -1) or EMITS its capture group
  (group >= 0) as the tokens.
- `analysis/common/.../pattern/SimplePatternSplitTokenizer.java:44` —
  the split-only fast variant.

Spark re-expression: everything regex-shaped stays JVM-side
(`regexp_replace`, `split`, `regexp_extract_all` — all inside
whole-stage codegen, no Python in the hot path).  The general mapping
filter is the one surface that genuinely needs a custom kernel
(longest-match single pass with per-match replacement lookup — JVM
regex replacement cannot consult a map), so it ships two routes:

- :func:`translate_chars` — pure-JVM `F.translate` when every rule is
  one codepoint → at most one codepoint (the common folding case);
- :func:`mapping_char_filter` — an Arrow-batched pandas UDF compiling
  the rules into one alternation regex ordered longest-first, exactly
  Lucene's greedy longest-match semantics, one pass, vectorized via
  `pandas.Series.str.replace`.

At 100 TB the regex routes are free (codegen'd per task, no shuffle);
the UDF route is an Arrow batch map with a precompiled pattern — the
same scale shape as every analyzer kernel in this package.
"""

from __future__ import annotations

import re
from typing import Dict, Iterator

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

__all__ = [
    "translate_chars",
    "mapping_char_filter",
    "pattern_replace_char_filter",
    "pattern_tokens",
    "simple_pattern_split_tokens",
]


def translate_chars(col, mappings: Dict[str, str]) -> Column:
    """Pure-JVM MappingCharFilter fast path: every rule must map ONE
    codepoint to ZERO or ONE codepoint (deletion = '').  Compiles to a
    single `translate` expression (whole-stage codegen)."""
    for k, v in mappings.items():
        if len(k) != 1 or len(v) > 1:
            raise ValueError(
                f"translate_chars needs 1-char → ≤1-char rules, got {k!r}→{v!r}; "
                "use mapping_char_filter for multi-char rules"
            )
    src = "".join(mappings.keys())
    dst = "".join(mappings.values())
    return F.translate(col, src, dst)


def _compile_rules(mappings: Dict[str, str]):
    # longest input first == Lucene's greedy longest-match at each
    # position (Java FST matching); alternation tries in order.
    keys = sorted(mappings.keys(), key=len, reverse=True)
    if not keys or any(k == "" for k in keys):
        raise ValueError("mapping rules must have non-empty inputs")
    pat = re.compile("|".join(re.escape(k) for k in keys))
    return pat, dict(mappings)


def mapping_char_filter(col, mappings: Dict[str, str]) -> Column:
    """MappingCharFilter analog: one left-to-right pass, longest match
    wins, replacement text is NOT rescanned (exactly the reference's
    stream semantics — a chain of sequential `regexp_replace` calls
    would rescan and diverge).  Arrow-batched pandas UDF."""
    pat, table = _compile_rules(mappings)

    @F.pandas_udf(StringType())
    def _map(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        repl = lambda m: table[m.group(0)]  # noqa: E731
        for s in batches:
            yield s.str.replace(pat, repl, regex=True)

    return _map(col)


def pattern_replace_char_filter(col, pattern: str, replacement: str) -> Column:
    """PatternReplaceCharFilter analog — JVM `regexp_replace` on the
    raw text before tokenization."""
    return F.regexp_replace(col, pattern, replacement)


def pattern_tokens(col, pattern: str, group: int = -1) -> Column:
    """PatternTokenizer analog → `array<string>` token column.

    group == -1: the pattern is the DELIMITER (split, empties dropped —
    PatternTokenizer never emits zero-length tokens).
    group >= 0: every match's capture group `group` is a token
    (`regexp_extract_all`).  Both routes are pure JVM."""
    if group < 0:
        toks = F.split(col, pattern)
        return F.filter(toks, lambda t: t != F.lit(""))
    return F.regexp_extract_all(col, F.lit(pattern), F.lit(group))


def simple_pattern_split_tokens(col, pattern: str) -> Column:
    """SimplePatternSplitTokenizer analog (split-only route)."""
    return pattern_tokens(col, pattern, group=-1)
