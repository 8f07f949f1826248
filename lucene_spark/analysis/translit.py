"""Script transliteration (ICUTransformFilter analog,
`analysis/icu/.../ICUTransformFilter.java:58`).

The reference wraps `com.ibm.icu.text.Transliterator` and applies a
named transform per token ("Cyrillic-Latin", "Katakana-Hiragana",
"Fullwidth-Halfwidth", …).  The container ships no ICU4J/PyICU, so the
re-expression pins the published standard tables each transform is
defined by and compiles them to Spark expressions:

- ``Katakana-Hiragana`` / ``Hiragana-Katakana`` — pure codepoint
  offset (U+30A1..U+30F6 ↔ U+3041..U+3096, plus the iteration/long
  marks) → one `F.translate`, whole-stage codegen, no Python.
- ``Fullwidth-Halfwidth`` — U+FF01..U+FF5E → ASCII − 0xFEE0 and the
  ideographic space U+3000 → ' ' → `F.translate` (the halfwidth-kana
  leg of the real transform needs combining-mark logic and is out of
  scope; documented divergence).
- ``Cyrillic-Latin`` — ISO 9:1995 (the system ICU's rules follow):
  strictly 1 codepoint → 1 codepoint with diacritics (ж→ž, щ→ŝ, ю→û)
  → `F.translate`, both cases.
- ``Greek-Latin`` — UNGEGN-style table with digraphs (θ→th, ψ→ps,
  ου→ou); digraph rules need longest-match single-pass semantics →
  reuses :func:`mapping_char_filter`'s Arrow kernel.

Named transforms not in the registry raise ``ValueError`` loudly (no
silent identity), mirroring Transliterator.getInstance's failure for
unknown IDs.  All 1:1 routes are JVM-only (plan-asserted in tests);
at 100 TB the transform is a per-task codegen'd expression with zero
shuffle and zero Python for the three offset/ISO-9 transforms.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from lucene_spark.analysis.charfilter import mapping_char_filter

__all__ = ["icu_transform", "TRANSFORM_IDS"]


def _offset_table(lo: int, hi: int, delta: int) -> dict:
    return {chr(c): chr(c + delta) for c in range(lo, hi + 1)}


# ISO 9:1995 — 1:1, case-paired. (The GOST 7.79 System A table.)
_ISO9_LOWER = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ё": "ë", "ж": "ž", "з": "z", "и": "i", "й": "j", "к": "k",
    "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
    "с": "s", "т": "t", "у": "u", "ф": "f", "х": "h", "ц": "c",
    "ч": "č", "ш": "š", "щ": "ŝ", "ъ": "ʺ", "ы": "y", "ь": "ʹ",
    "э": "è", "ю": "û", "я": "â",
    # Ukrainian/Belarusian letters in the same standard (ґ→g̀ needs a
    # combining mark — not 1:1 — and is omitted; documented divergence)
    "є": "ê", "і": "ì", "ї": "ï", "ў": "ŭ",
}


def _iso9_table() -> dict:
    t = dict(_ISO9_LOWER)
    for k, v in list(_ISO9_LOWER.items()):
        t[k.upper()] = v.upper()
    return t


# UNGEGN-flavoured Greek→Latin with the digraph rules that make it
# non-1:1 (longest-match). Lowercase only — fold first, like the
# reference chains ICUTransformFilter after lowercasing filters.
_GREEK_LATIN = {
    "ου": "ou", "αυ": "au", "ευ": "eu",
    "θ": "th", "ψ": "ps", "ξ": "x", "χ": "ch", "φ": "f",
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "i", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t",
    "υ": "y", "ω": "o",
    # tonos/dialytika vowels fold to their base transliteration
    "ά": "a", "έ": "e", "ή": "i", "ί": "i", "ό": "o", "ύ": "y",
    "ώ": "o", "ϊ": "i", "ϋ": "y", "ΐ": "i", "ΰ": "y",
}

# Katakana U+30A1..U+30F6 ↔ Hiragana U+3041..U+3096 (Δ = −0x60),
# plus the voiced/iteration marks pair U+30FD/30FE ↔ U+309D/309E.
_KATA_HIRA = {**_offset_table(0x30A1, 0x30F6, -0x60),
              "ヽ": "ゝ", "ヾ": "ゞ"}
_HIRA_KATA = {v: k for k, v in _KATA_HIRA.items()}

# Fullwidth ASCII U+FF01..U+FF5E → U+0021..U+007E; ideographic space.
_FULL_HALF = {**_offset_table(0xFF01, 0xFF5E, -0xFEE0), "　": " "}

_ONE_TO_ONE = {
    "Katakana-Hiragana": _KATA_HIRA,
    "Hiragana-Katakana": _HIRA_KATA,
    "Fullwidth-Halfwidth": _FULL_HALF,
    "Cyrillic-Latin": None,  # built lazily (case-paired ISO 9)
}

TRANSFORM_IDS = (
    "Katakana-Hiragana",
    "Hiragana-Katakana",
    "Fullwidth-Halfwidth",
    "Cyrillic-Latin",
    "Greek-Latin",
)


def icu_transform(col, transform_id: str) -> Column:
    """The named transliteration applied to a string column.  1:1
    transforms compile to a single JVM `translate`; Greek-Latin (the
    digraph case) routes through the single-pass longest-match Arrow
    kernel shared with MappingCharFilter."""
    if transform_id == "Greek-Latin":
        return mapping_char_filter(col, _GREEK_LATIN)
    if transform_id not in _ONE_TO_ONE:
        raise ValueError(
            f"unknown transform {transform_id!r}; available: {TRANSFORM_IDS}"
        )
    table = _ONE_TO_ONE[transform_id] or _iso9_table()
    return F.translate(col, "".join(table.keys()), "".join(table.values()))
