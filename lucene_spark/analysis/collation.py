"""Collation-keyed sorting and ranges (CollationKeyAnalyzer /
ICUCollationKeyAnalyzer analogs).

`lucene/analysis/common/src/java/org/apache/lucene/collation/
CollationKeyAnalyzer.java:48` (and the ICU variant,
`analysis/icu/src/java/org/apache/lucene/analysis/icu/
ICUCollationKeyAnalyzer.java:49`) index each term as its locale
collation SORT KEY so that term-range queries and index sorts respect
locale order instead of UTF-16 binary order — the canonical use cases
being case-/accent-insensitive ranges and language-correct ordering.

The Spark re-expression needs no key bytes at all: Spark 4's native
collation support attaches the collation to the STRING TYPE
(``collate(col, 'UNICODE')`` — ICU root, locale ids like ``'en_CI'``,
or ``'UTF8_LCASE'``), and every comparison, sort, range predicate and
join on that column then runs under ICU collation INSIDE the JVM
(whole-stage codegen, no UDF, no key column to store — though
:func:`collation_key` materializes one when an on-disk sort key is
wanted, which is exactly what the reference's analyzer emits).

Oracle parity: ``UTF8_LCASE`` compares the lowercased UTF-8 bytes, so
it is dual-emittable as ``lower(col)`` comparisons in any engine
(binary UTF-8 order == code-point order by construction); ICU locale
collations are engine-side only and are pinned by golden-order pytests
instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "collated",
    "collation_key",
    "collation_range",
    "collation_sorted",
]


def _quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def collated(col: str, collation: str = "UNICODE") -> Column:
    """The column re-typed under `collation` — every downstream
    comparison/sort/groupBy on it is collation-aware, JVM-side."""
    return F.expr(f"collate({col}, '{_quote(collation)}')")


def collation_key(col: str, collation: str = "UNICODE") -> Column:
    """A sortable binary key for on-disk index sorting — what
    CollationKeyAnalyzer's token stream emits (collationkey bytes).
    Under Spark collations the collated string itself IS the sort key
    (the ICU key stays internal), so this returns the collated value;
    persist it next to the raw column and `sort_docs` on it."""
    return collated(col, collation)


def collation_range(
    df: DataFrame,
    col: str,
    lo: str,
    hi: str,
    collation: str = "UNICODE",
) -> DataFrame:
    """Term-range under a collation (the reference's locale-correct
    TermRangeQuery over collation keys). Bounds inclusive; both sides
    of each comparison carry the collation so the ICU comparator is
    used."""
    c = collated(col, collation)
    lo_c = F.expr(f"collate('{_quote(lo)}', '{_quote(collation)}')")
    hi_c = F.expr(f"collate('{_quote(hi)}', '{_quote(collation)}')")
    return df.filter((c >= lo_c) & (c <= hi_c))


def collation_sorted(
    df: DataFrame,
    col: str,
    collation: str = "UNICODE",
    ascending: bool = True,
) -> DataFrame:
    """`df` ordered by `col` under the collation, with the raw binary
    value as deterministic tiebreak (collation-equal strings — e.g.
    case variants under a _CI collation — would otherwise order
    unstably)."""
    c = collated(col, collation)
    keys = [c.asc() if ascending else c.desc(), F.col(col).asc()]
    return df.orderBy(*keys)
