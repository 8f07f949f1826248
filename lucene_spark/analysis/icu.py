"""ICU folding / normalization filters (Unicode-data-driven).

Re-expression of the reference's ICU analysis module:

- ``ICUFoldingFilter``
  (`lucene/analysis/icu/src/java/org/apache/lucene/analysis/icu/ICUFoldingFilter.java:64`):
  applies the UTR#30 folding set — case folding, accent (diacritic)
  removal, width/compatibility folding — composed with NFKC
  normalization (the shipped ``utr30.nrm`` table).
- ``ICUNormalizer2Filter``
  (`.../ICUNormalizer2Filter.java:52`): plain Unicode normalization
  (default ``nfkc_cf``).

This implementation derives every folding from the PUBLIC Unicode
character database via Python's ``unicodedata`` (same upstream data
ICU compiles into utr30.nrm), composed exactly as UTR#30 specifies:

    NFKC → full case fold → canonical decompose (NFKD) →
    strip combining marks (Mn) → NFKC recompose

which yields the published examples: ``Résumé→resume``, ``ﬁnance→
finance`` (ligature), ``ＦＵＬＬ→full`` (width), ``straße→strasse``
(case fold expansion), ``İstanbul→istanbul`` (dot-above stripped),
``Ⅻ→xii`` (compatibility), Greek final sigma ``ς→σ``; CJK/emoji pass
through unchanged.

Scale shape: the fold is a per-token pure function applied inside the
existing Arrow-batched analysis UDFs (the analysis chain is already
the build's Python stage — this adds zero extra Spark stages, no
shuffle, no driver work). Like the reference, morphological ja/ko
segmentation (kuromoji/nori) is a separate dictionary-driven tokenizer
and is NOT claimed here; the CJK bigram chain (`analysis/cjk.py`) is
the dictionary-free path, exactly Lucene's own ``CJKAnalyzer``
fallback.
"""

import unicodedata
from functools import lru_cache
from typing import Iterator, List, Tuple

import pandas as pd

__all__ = [
    "icu_fold_str",
    "icu_normalize_str",
    "icu_fold_tokens_udf",
    "icu_analyzer",
]


@lru_cache(maxsize=65536)
def _fold_cached(tok: str) -> str:
    # NFKC first (compatibility + canonical compose: widths, ligatures,
    # roman numerals), then the full case fold (str.casefold implements
    # Unicode full case folding incl. ß→ss, ς→σ, İ→i+̇),
    # then strip diacritics: canonical decompose, drop Mn, recompose.
    s = unicodedata.normalize("NFKC", tok).casefold()
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return unicodedata.normalize("NFKC", s)


def icu_fold_str(tok: str) -> str:
    """UTR#30 folding of one token (ICUFoldingFilter semantics)."""
    if tok.isascii():  # fast path: ASCII folds to plain lowercase
        return tok.lower()
    return _fold_cached(tok)


def icu_normalize_str(s: str, form: str = "nfkc_cf") -> str:
    """ICUNormalizer2Filter analog. ``form`` ∈ nfc | nfkc | nfkc_cf."""
    if form == "nfc":
        return unicodedata.normalize("NFC", s)
    if form == "nfkc":
        return unicodedata.normalize("NFKC", s)
    if form == "nfkc_cf":
        # Normalizer2.getNFKCCasefoldInstance: NFKC + case fold + NFKC
        return unicodedata.normalize(
            "NFKC", unicodedata.normalize("NFKC", s).casefold()
        )
    raise ValueError(f"unknown normalization form {form!r}")


def icu_fold_tokens_udf():
    """pandas_udf: ``array<string>`` tokens → folded tokens (one
    Arrow-batched map over the token arrays — composes after any
    tokenizer column, like the TokenFilter it re-expresses)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def _fold(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda toks: [icu_fold_str(t) for t in toks]
                if toks is not None
                else None
            )

    return _fold


def icu_analyzer(stopwords: frozenset = frozenset()):
    """ICUAnalyzer-shaped chain: UAX#29 tokenize → ICU fold (which
    subsumes lowercasing) → optional stop removal. Returns a callable
    ``text -> [(term, position)]`` usable as
    ``InvertedIndex.build(analyzer=...)`` (positions follow the
    pre-stop-removal ordinals, like StopFilter's position increments).
    """
    from lucene_spark.analysis.analyzer import tokenize

    def analyze(text: str) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for pos, tok in enumerate(tokenize(text)):
            folded = icu_fold_str(tok)
            if folded not in stopwords:
                out.append((folded, pos))
        return out

    return analyze
