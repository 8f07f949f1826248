"""Standard analysis chain: tokenize → lowercase → stop, Arrow-batched.

Re-creates the semantics of Lucene's default chain
(`lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:85-96`):

1. **StandardTokenizer** — UAX#29 word-break segmentation
   (`StandardTokenizer.java:38-113`): word tokens (letters/digits/marks,
   with MidLetter ``' ’ :`` joins between letters and MidNum ``. ,``
   joins between digits, MidNumLet ``.`` between letters, ExtendNumLet
   ``_``), per-character IDEOGRAPHIC and HIRAGANA tokens, KATAKANA and
   HANGUL runs, EMOJI sequences (UTS#51), Southeast-Asian runs; tokens
   longer than ``max_token_length=255`` are **split**, not dropped
   (`StandardTokenizer.java:152-168`).
2. **LowerCaseFilter** — per-codepoint simple lowercase mapping,
   matching Java ``Character.toLowerCase(int)``
   (`analysis/LowerCaseFilter.java:36-39`, `CharacterUtils.java:53-60`)
   — NOT Python ``str.lower()`` full-case mapping (they differ on e.g.
   U+0130 İ, which full-maps to "i" + combining dot but simple-maps to
   "i").
3. **StopFilter** — drops the 33-word English stopset
   (`analysis/common/.../en/EnglishAnalyzer.java:43-52`) while
   preserving position increments
   (`analysis/FilteringTokenFilter.java:49-75`): surviving tokens keep
   their pre-stop position ordinal, and the field length used for norms
   counts only surviving tokens (`index/IndexingChain.java:1154-1160`).

Round 3: tokenization follows the rule-level UAX#29 scanner in
:mod:`lucene_spark.analysis.uax29` (WB4 mark absorption, emoji
ZWJ/flag/keycap sequences, Southeast-Asian runs, Hebrew quote rules);
remaining divergences from the reference's generated JFlex tables are
documented in that module and pinned by golden tests.

Everything is exposed two ways:

- :func:`analyze` — pure-Python per-string (unit tests, goldens);
- :func:`standard_analyzer_udf` — ``pandas_udf`` over Arrow batches
  producing ``array<struct<term:string,pos:int>>`` (the indexing path);
- :func:`tokens_simple_col` — a pure Spark-SQL tokenizer (split on
  single spaces) used for the DuckDB-oracle parity queries where the
  corpus is already space-normalized.
"""

from __future__ import annotations

import sys
from collections import Counter
from functools import lru_cache
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

__all__ = [
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
    "simple_lowercase",
    "tokenize",
    "analyze",
    "standard_analyzer_udf",
    "url_email_tokenizer_udf",
    "term_freq_udf",
    "tokens_simple_col",
    "extract_text_col",
]

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (`en/EnglishAnalyzer.java:48-50`)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardTokenizer.maxTokenLength default


@lru_cache(maxsize=1)
def _simple_lower_table() -> dict:
    """Per-codepoint simple lowercase table ≈ Java Character.toLowerCase.

    Python's str.lower() is the *full* case mapping; the simple mapping
    differs only where the full mapping is multi-codepoint. We take the
    single-codepoint lowerings from Python and override the handful of
    multi-codepoint full mappings with their UnicodeData simple
    mappings.
    """
    table = {}
    for cp in range(sys.maxunicode + 1):
        ch = chr(cp)
        lo = ch.lower()
        if lo != ch and len(lo) == 1:
            table[cp] = lo
    # full mapping is multi-codepoint; simple mapping per UnicodeData:
    table[0x0130] = "i"  # LATIN CAPITAL LETTER I WITH DOT ABOVE → i
    return table


def simple_lowercase(s: str) -> str:
    """Codepoint-wise lowercase (Java Character.toLowerCase semantics)."""
    return s.translate(_simple_lower_table())


# --- tokenizer ------------------------------------------------------------
# Round 3: the regex approximation was replaced by a rule-level UAX#29
# scanner (see analysis/uax29.py) - emoji ZWJ/flag/keycap sequences,
# Southeast-Asian runs, Hebrew quote rules and WB4 mark absorption now
# follow the spec instead of per-scalar heuristics.
from lucene_spark.analysis.uax29 import uax29_tokenize


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> List[str]:
    """UAX#29 word segmentation with the 255-char split rule."""
    out: List[str] = []
    for tok in uax29_tokenize(text):
        if len(tok) <= max_token_length:
            out.append(tok)
        else:  # StandardTokenizer *splits* over-long tokens (:152-168)
            for i in range(0, len(tok), max_token_length):
                out.append(tok[i : i + max_token_length])
    return out


def analyze(text: str, stopwords: frozenset = ENGLISH_STOP_WORDS) -> List[Tuple[str, int]]:
    """Full chain → [(term, position)]; positions pre-stop-removal.

    StopFilter preserves position increments
    (`FilteringTokenFilter.java:49-75`), so a surviving token's position
    is its ordinal in the tokenized stream before stop removal.

    Lowercasing is hoisted before tokenization (one C-level
    ``str.translate`` instead of per-token calls): UAX#29 word-break
    classes are case-insensitive, so boundaries are unchanged —
    property-tested against the per-token order in
    ``tests/test_analyzer.py``.
    """
    out: List[Tuple[str, int]] = []
    for pos, tok in enumerate(tokenize(simple_lowercase(text))):
        if tok not in stopwords:
            out.append((tok, pos))
    return out


def term_freqs(text: str, stopwords: frozenset = ENGLISH_STOP_WORDS):
    """(term→freq dict, dl) with no per-token Python — the hot path.

    Equivalent to ``Counter(t for t, _ in analyze(text))`` but built
    from whole-string passes: one ``str.translate`` lowercase (safe to
    hoist before tokenization — UAX#29 word-break classes are
    case-insensitive), one segmentation pass (C-level ``findall`` for
    ASCII text), ``Counter``. Verified identical to :func:`analyze` in
    tests. dl counts surviving tokens only
    (`index/IndexingChain.java:1154-1160`).
    """
    toks = uax29_tokenize(text.translate(_simple_lower_table()))
    cnt = Counter(toks)
    dl = len(toks)
    # over-long tokens split, not dropped (StandardTokenizer:152-168)
    long_keys = [t for t in cnt if len(t) > MAX_TOKEN_LENGTH]
    for t in long_keys:
        n = cnt.pop(t)
        pieces = range(0, len(t), MAX_TOKEN_LENGTH)
        for i in pieces:
            piece = t[i : i + MAX_TOKEN_LENGTH]
            cnt[piece] = cnt.get(piece, 0) + n
        dl += n * (len(pieces) - 1)
    for sw in stopwords & cnt.keys():
        dl -= cnt.pop(sw)
    return cnt, dl


_TOKEN_SCHEMA = ArrayType(
    StructType(
        [StructField("term", StringType()), StructField("pos", IntegerType())]
    )
)


def standard_analyzer_udf():
    """pandas_udf: text column → array<struct<term,pos>> (Arrow batches)."""

    @F.pandas_udf(_TOKEN_SCHEMA)
    def _analyze(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(lambda t: analyze(t) if isinstance(t, str) else [])

    return _analyze


def url_email_tokenizer_udf():
    """pandas_udf: text → array<string> raw UAX29URLEmailTokenizer
    tokens (URLs/emails kept whole, no lowercase/stop)."""
    from lucene_spark.analysis.uax29 import uax29_url_email_tokenize

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda t: uax29_url_email_tokenize(t) if isinstance(t, str) else []
            )

    return _tok


def term_freq_udf(analyzer: str = "standard", positions: bool = False):
    """pandas_udf: text → struct<dl:int, tf:array<struct<term,freq[,positions]>>>.

    Emits the per-document inversion result *pre-aggregated* — the
    in-RAM equivalent of Lucene's per-document TermsHash
    (`index/FreqProxTermsWriterPerField.java:113,141`: freq and
    positions accumulate per term while the doc is processed, BEFORE
    anything is written). Doing the doc-local aggregation inside the
    Arrow batch means the (doc, term) → freq shuffle disappears from
    the build plan: only already-aggregated postings cross the wire,
    and ``dl`` (the norm input) comes out of the same pass.

    analyzer='standard' → full Lucene-equivalent chain;
    analyzer='simple' → split on single spaces (space-normalized
    corpora; byte-identical to the JVM/DuckDB split used by the
    oracle-parity queries).
    """
    fields = [
        StructField("term", StringType()),
        StructField("freq", IntegerType()),
    ]
    if positions:
        fields.append(StructField("positions", ArrayType(IntegerType())))
    schema = StructType(
        [StructField("dl", IntegerType()), StructField("tf", ArrayType(StructType(fields)))]
    )

    def one_doc(text):
        if not isinstance(text, str) or not text:
            return {"dl": 0, "tf": []}
        if analyzer == "standard":
            toks = analyze(text)
        else:
            toks = [
                (t, i) for i, t in enumerate(text.split(" ")) if t
            ]
        if positions:
            acc: dict = {}
            for term, pos in toks:
                acc.setdefault(term, []).append(pos)
            tf = [
                {"term": t, "freq": len(ps), "positions": ps} for t, ps in acc.items()
            ]
        else:
            cnt: dict = {}
            for term, _ in toks:
                cnt[term] = cnt.get(term, 0) + 1
            tf = [{"term": t, "freq": f} for t, f in cnt.items()]
        return {"dl": len(toks), "tf": tf}

    @F.pandas_udf(schema)
    def _tf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # struct return type ⇒ yield a DataFrame with one column per field
        for s in batches:
            recs = s.map(one_doc)
            yield pd.DataFrame(
                {"dl": recs.map(lambda r: r["dl"]), "tf": recs.map(lambda r: r["tf"])}
            )

    return _tf


def tokens_simple_col(text_col):
    """Pure-SQL tokenizer for space-normalized corpora: split on ' '.

    JVM-side, whole-stage-codegen'd; byte-identical to DuckDB
    ``string_split(text, ' ')`` for the oracle comparison.
    """
    return F.split(text_col, " ")


def extract_text_col(html_col):
    """Byte-identical text extraction from the synthetic html wrapper.

    The corpus generator wraps text as
    ``b"<html><body>" + text + b"</body></html>"``; stripping the fixed
    wrapper recovers the text byte-identically (per-url invariant of
    BASELINE.json input_hint). JVM-side: decode + regexp_replace.
    """
    s = F.decode(html_col, "UTF-8")
    return F.regexp_replace(s, r"^<html><body>|</body></html>$", "")
