"""CJK analysis chain: width folding + CJK bigrams (CJKAnalyzer).

Re-expresses the reference's CJK family
(`analysis/common/src/java/org/apache/lucene/analysis/cjk/`):

- :func:`cjk_width_fold` — CJKWidthCharFilter/CJKWidthFilter
  (`cjk/CJKWidthCharFilter.java`): fold fullwidth ASCII variants
  (U+FF01-FF5E) to basic Latin and halfwidth Katakana variants
  (U+FF65-FF9F) to standard Katakana, composing halfwidth voiced
  (dakuten/handakuten) marks into the preceding kana where a composed
  form exists (NFC supplies the same compositions as the filter's
  table).
- :func:`cjk_bigram_tokens` — CJKBigramFilter
  (`cjk/CJKBigramFilter.java`): forms bigrams over runs of
  Han/Hiragana/Katakana/Hangul codepoints. Adjacency follows the
  reference exactly: consecutive CJK tokens chain ONLY when their
  offsets touch (`startOffset != lastEndOffset` clears the buffer), so
  whitespace breaks a run; a run of one codepoint emits a unigram;
  ``output_unigrams=True`` interleaves unigrams and stacked bigrams
  (A, AB, B, BC, C with the bigram occupying the position of its first
  char), the combined unigram+bigram configuration.
- :func:`cjk_analyze` — CJKAnalyzer (`cjk/CJKAnalyzer.java`):
  StandardTokenizer → width fold (char-filter placement) → lowercase →
  CJK bigrams → StopFilter with the analyzer's own stopword file
  (English function words + 'www' etc.; `cjk/stopwords.txt`).

``cjk_analyze`` is a callable analyzer for
``InvertedIndex.build(analyzer=cjk_analyze, ...)`` — it runs inside
the Arrow-batched build kernel like every other analysis chain.
"""

from __future__ import annotations

import unicodedata
from typing import List, Tuple

from lucene_spark.analysis.uax29 import uax29_tokenize_spans

__all__ = [
    "cjk_width_fold",
    "cjk_bigram_tokens",
    "cjk_analyze",
    "CJK_STOP_WORDS",
]

# `cjk/stopwords.txt` (minus comment lines)
CJK_STOP_WORDS = frozenset(
    """a and are as at be but by for if in into is it no not of on or s
    such t that the their then there these they this to was will with
    www""".split()
)

_HANGUL_RANGES = [
    (0x1100, 0x11FF),
    (0x3130, 0x318F),
    (0xA960, 0xA97F),
    (0xAC00, 0xD7A3),
    (0xD7B0, 0xD7FF),
]
_KATAKANA_RANGES = [
    (0x30A0, 0x30FA),
    (0x30FC, 0x30FF),
    (0x31F0, 0x31FF),
    (0x1B000, 0x1B000),
]
_HIRAGANA_RANGES = [(0x3041, 0x3096), (0x309D, 0x309F)]
_HAN_RANGES = [
    (0x3005, 0x3007),
    (0x3400, 0x4DBF),
    (0x4E00, 0x9FFF),
    (0xF900, 0xFA6D),
    (0xFA70, 0xFAD9),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2EBEF),
    (0x30000, 0x3134A),
]


def _in(cp: int, ranges) -> bool:
    return any(lo <= cp <= hi for lo, hi in ranges)


def _cjk_script(cp: int):
    """'han' | 'hiragana' | 'katakana' | 'hangul' | None for one
    codepoint (the StandardTokenizer type the bigram filter keys on)."""
    if _in(cp, _HAN_RANGES):
        return "han"
    if _in(cp, _HIRAGANA_RANGES):
        return "hiragana"
    if _in(cp, _KATAKANA_RANGES):
        return "katakana"
    if _in(cp, _HANGUL_RANGES):
        return "hangul"
    return None


# halfwidth Katakana U+FF65-FF9F → standard Katakana (KANA_NORM table
# of `cjk/CJKWidthFilter.java`; FF9E/FF9F map to the COMBINING voiced
# marks 3099/309A so NFC can compose them into the preceding kana)
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]


def cjk_width_fold(text: str) -> str:
    """Fullwidth ASCII → Latin; halfwidth Katakana → standard, with
    voiced-mark composition. Char-level, so it can run before
    tokenization (`cjk/CJKWidthCharFilter.java` placement).

    Composition is applied ONLY to the kana + combining-voiced-mark
    pairs this fold itself produced — exactly the filter's
    dakuten/handakuten table (NFC of the pair). A whole-text NFC would
    also normalize unrelated characters, making identical inputs index
    differently depending on whether they happen to contain halfwidth
    kana."""
    out: list = []
    for ch in text:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
            continue
        if cp == 0x3000:  # ideographic space → space
            out.append(" ")
            continue
        if 0xFF65 <= cp <= 0xFF9F:
            ch = chr(_KANA_NORM[cp - 0xFF65])
            if ch in ("\u3099", "\u309A") and out:
                composed = unicodedata.normalize("NFC", out[-1] + ch)
                if len(composed) == 1:
                    out[-1] = composed
                    continue
        out.append(ch)
    return "".join(out)


def cjk_bigram_tokens(
    spans, output_unigrams: bool = False
) -> List[Tuple[str, int]]:
    """(token, start, end, rule) spans → (term, position) stream with
    CJK runs bigrammed (`cjk/CJKBigramFilter.java` semantics; non-CJK
    tokens pass through unmodified)."""
    out: List[Tuple[str, int]] = []
    pos = 0
    # buffered run of CJK codepoints with contiguous offsets
    run: List[str] = []
    last_end = -1

    def flush_run():
        nonlocal pos
        if not run:
            return
        if len(run) == 1:
            # lone CJK char: unigram fallback
            out.append((run[0], pos))
            pos += 1
        elif output_unigrams:
            # A, AB(stacked), B, BC(stacked), C — bigram sits at the
            # position of its first char (posInc 0 after the unigram)
            for i, ch in enumerate(run):
                out.append((ch, pos))
                if i + 1 < len(run):
                    out.append((run[i] + run[i + 1], pos))
                pos += 1
        else:
            for i in range(len(run) - 1):
                out.append((run[i] + run[i + 1], pos))
                pos += 1
        run.clear()

    for tok, start, end, _rule in spans:
        scripts = [_cjk_script(ord(c)) for c in tok]
        if all(s is not None for s in scripts) and tok:
            # CJK-typed token: chains with the buffer only when
            # offsets are contiguous (whitespace clears the buffer)
            if start != last_end:
                flush_run()
            run.extend(tok)
            last_end = end
        else:
            flush_run()
            last_end = -1
            out.append((tok, pos))
            pos += 1
    flush_run()
    return out


def cjk_analyze(text: str) -> List[Tuple[str, int]]:
    """CJKAnalyzer chain → (term, position) tuples for the build
    kernel: width fold → UAX#29 tokenize → lowercase → CJK bigram →
    stop-filter (positions keep their increments across removed
    stopwords, as StopFilter does)."""
    spans = [
        (tok.lower(), s, e, rule)
        for tok, s, e, rule in uax29_tokenize_spans(cjk_width_fold(text))
    ]
    return [
        (term, p)
        for term, p in cjk_bigram_tokens(spans)
        if term not in CJK_STOP_WORDS
    ]
