"""PII scrubbing for training-data pipelines.

A web-scale corpus headed for model training needs personally
identifying strings removed or masked before anything else touches the
text (the standard pre-training scrub step alongside dedup/quality
filtering). Everything here is column-level JVM regex —
`regexp_replace` / `regexp_extract_all` — so the scrub is one
codegen'd projection over the corpus scan: no UDF, no shuffle, no
Python in the path, and it composes with the analysis chain at 100 TB
for free (filters stay pushdown-able because the scrub is a
projection, not a filter).

Patterns are deliberately written in the regex subset with identical
semantics in Spark (Java regex) and DuckDB (RE2) so the driver's
oracle can replay the exact transformation:

- email: ``local@domain.tld`` per the practical RFC 5322 subset;
- IPv4: four 1-3 digit octets (word-bounded);
- phone: international/US-style sequences (``+1 555-123-4567``,
  ``(555) 123 4567``) — the shape requires ≥9 digits ending in a
  4-digit group, so plain numbers in prose (years, 8-digit dates,
  order ids) survive;
- SSN-shaped: ``ddd-dd-dddd`` (word-bounded).

Masking replaces each match with a typed sentinel (``<EMAIL>``,
``<IP>``, ``<PHONE>``, ``<SSN>``) so downstream tokenization sees a
stable vocabulary item instead of a hole.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts"]

# Ordered: emails first (an email contains digit runs a later pattern
# could half-match), then SSN before phone (both are digit groups, SSN
# is the stricter shape).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (
        "phone",
        # final group fixed at 4 digits → minimum total is 9 digits
        # (2+3+4), keeping 8-digit dates/order ids ('20250817') unmasked
        r"(\+?\d{1,3}[ .-]?)?(\(\d{2,4}\)|\d{2,4})[ .-]?\d{3,4}[ .-]?\d{4}\b",
        "<PHONE>",
    ),
]


def redact_pii(text_col: Column, kinds=None) -> Column:
    """Masked text column: every PII match replaced by its typed
    sentinel, applied in the canonical pattern order."""
    wanted = set(kinds) if kinds is not None else None
    out = text_col
    for name, pat, token in PII_PATTERNS:
        if wanted is None or name in wanted:
            out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level PII hit counts per kind (the audit report run
    before/after a scrub): one scan, map-side partial aggregation."""
    aggs = [
        F.sum(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        ).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return df.agg(*aggs)
