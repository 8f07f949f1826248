"""OpenNLP analysis-chain analog: sentence detection, sentence-scoped
tokenization, POS tagging, shallow (IOB) chunking, and lemmatization.

Reference parity targets:
  - lucene/analysis/opennlp/src/java/org/apache/lucene/analysis/opennlp/OpenNLPTokenizer.java:30
    (sentence-segmenting tokenizer: detect sentences, tokenize each,
    every token carries its sentence index via SentenceAttribute)
  - OpenNLPSentenceBreakIterator.java:33 (sentence spans over the text)
  - OpenNLPPOSFilter.java:36 (per-sentence POS tags written to the
    token TYPE attribute)
  - OpenNLPChunkerFilter.java:31 (per-sentence IOB chunk labels written
    to TYPE, consuming the POS tags the POS filter left there)
  - OpenNLPLemmatizerFilter.java:50 (dictionary-first, then model
    lemmas; keyword-marked tokens skipped)
  - SentenceAttributeExtractor.java:28 (batch one sentence of tokens
    at a time)

The reference delegates each step to a trained OpenNLP MaxEnt model
loaded from a binary file.  Model binaries cannot ship here, so each
step is a DETERMINISTIC rule implementation with the same interface —
the model call is a seam (`*_op` callables) a user can rebind to a real
``opennlp``/``spacy`` pipeline; the Spark plumbing (Arrow batch shape,
one pass per document, no shuffle) is identical either way:

  - sentence detection: terminator scan with abbreviation, initial,
    decimal, ellipsis, and closing-quote/bracket guards (the same
    feature set OpenNLP's SD model learns);
  - tokenization: whitespace split + leading/trailing punctuation
    peeling (en-token model behavior on standard text);
  - POS: closed-class lexicon + suffix/shape rules (Penn tags);
  - chunker: finite-state NP/VP/PP grammar over the tag sequence
    emitting B-*/I-*/O labels exactly like the chunker model's output;
  - lemmatizer: exception dictionary + English inflection rules.

At 100 TB every step runs inside ONE Arrow-batched pass per document
(`mapInPandas`-shaped, embarrassingly parallel over docs); nothing here
shuffles.  Sentence spans also feed the training-data chunking op in
``pipeline/chunking.py`` (overlapping sentence windows for RAG/context
packing).
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence, Tuple

__all__ = [
    "detect_sentences",
    "sentence_texts",
    "opennlp_tokenize",
    "pos_tags",
    "chunk_iob",
    "lemmatize",
    "opennlp_analyze",
    "sentences_udf",
    "pos_chunk_udf",
]


# ---------------------------------------------------------------------------
# Sentence detection (OpenNLPSentenceBreakIterator.java:33 analog)
# ---------------------------------------------------------------------------

# Abbreviations that do NOT end a sentence when followed by a period.
_ABBREVIATIONS = frozenset(
    """mr mrs ms dr prof st jr sr rev gen rep sen gov lt col maj sgt capt
    cmdr adm cpl pvt pfc vs etc inc ltd co corp dept univ assn bros ph.d
    e.g i.e cf al eds ed vol no nos art pp op cit fig figs sec secs chap
    jan feb mar apr jun jul aug sep sept oct nov dec mon tue wed thu fri
    sat sun approx appt apt est min max misc""".split()
)

_TERMINATORS = frozenset(".!?")
_CLOSERS = frozenset("\"')]}”’")


def detect_sentences(text: str) -> List[Tuple[int, int]]:
    """Return [start, end) sentence spans covering the non-space text.

    Guards (the features OpenNLP's sentence model encodes):
      - known abbreviations ("Dr.", "e.g.") do not split;
      - single-uppercase-letter initials ("J. Smith") do not split;
      - decimals / version numbers ("3.14") do not split;
      - runs of terminators ("?!", "...") split once, after the run;
      - closing quotes/brackets attach to the finished sentence;
      - the split only happens when the next non-space char starts a
        plausible new sentence (uppercase, digit, or opening quote).
    """
    spans: List[Tuple[int, int]] = []
    n = len(text)
    start = 0
    i = 0
    while i < n:
        ch = text[i]
        if ch not in _TERMINATORS:
            i += 1
            continue
        # swallow a terminator run (ellipsis, "?!")
        j = i
        while j + 1 < n and text[j + 1] in _TERMINATORS:
            j += 1
        if ch == "." and j == i:
            # abbreviation / initial / decimal guards (single period only)
            k = i - 1
            while k >= start and not text[k].isspace():
                k -= 1
            word = text[k + 1 : i].lower()
            if word in _ABBREVIATIONS or word.rstrip(".") in _ABBREVIATIONS:
                i += 1
                continue
            if len(word) == 1 and word.isalpha():
                i += 1
                continue
            if i + 1 < n and text[i + 1].isdigit():
                i += 1
                continue
        # attach closing quotes/brackets
        while j + 1 < n and text[j + 1] in _CLOSERS:
            j += 1
        # require a plausible sentence start after whitespace
        m = j + 1
        while m < n and text[m].isspace():
            m += 1
        if m < n and not (text[m].isupper() or text[m].isdigit() or text[m] in "\"'(“‘"):
            i = j + 1
            continue
        end = j + 1
        if text[start:end].strip():
            s = start
            while s < end and text[s].isspace():
                s += 1
            spans.append((s, end))
        start = end
        i = m if m > j + 1 else j + 1
    if text[start:].strip():
        s = start
        while s < n and text[s].isspace():
            s += 1
        spans.append((s, n))
    return spans


def sentence_texts(text: str) -> List[str]:
    return [text[a:b].strip() for a, b in detect_sentences(text)]


# ---------------------------------------------------------------------------
# Sentence-scoped tokenization (OpenNLPTokenizer.java:30 analog)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\d+(?:[.,]\d+)*          # numbers incl. decimals/thousands
      | [A-Za-z]+(?:['’][A-Za-z]+)*   # words incl. contractions
      | [^\sA-Za-z0-9]           # each punctuation char
    """,
    re.VERBOSE,
)


def opennlp_tokenize(text: str) -> List[Tuple[str, int, int, int]]:
    """(term, start, end, sentence_index) — every token carries its
    sentence index, the SentenceAttribute contract."""
    out: List[Tuple[str, int, int, int]] = []
    for si, (a, b) in enumerate(detect_sentences(text)):
        for m in _TOKEN_RE.finditer(text, a, b):
            out.append((m.group(), m.start(), m.end(), si))
    return out


# ---------------------------------------------------------------------------
# POS tagging (OpenNLPPOSFilter.java:36 analog; Penn Treebank tags)
# ---------------------------------------------------------------------------

_CLOSED_CLASS = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT",
    "he": "PRP", "she": "PRP", "it": "PRP", "they": "PRP", "we": "PRP",
    "i": "PRP", "you": "PRP",
    "his": "PRP$", "her": "PRP$", "its": "PRP$", "their": "PRP$",
    "my": "PRP$", "our": "PRP$", "your": "PRP$",
    "in": "IN", "on": "IN", "at": "IN", "by": "IN", "for": "IN",
    "with": "IN", "from": "IN", "of": "IN", "into": "IN", "over": "IN",
    "under": "IN", "after": "IN", "before": "IN", "through": "IN",
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC",
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
    "been": "VBN", "being": "VBG", "am": "VBP",
    "has": "VBZ", "have": "VBP", "had": "VBD",
    "do": "VBP", "does": "VBZ", "did": "VBD", "done": "VBN",
    "will": "MD", "would": "MD", "can": "MD", "could": "MD",
    "shall": "MD", "should": "MD", "may": "MD", "might": "MD",
    "must": "MD",
    "went": "VBD", "ran": "VBD", "saw": "VBD", "said": "VBD",
    "made": "VBD", "took": "VBD", "wrote": "VBD", "gave": "VBD",
    "came": "VBD", "got": "VBD", "found": "VBD", "knew": "VBD",
    "thought": "VBD", "left": "VBD", "written": "VBN", "taken": "VBN",
    "given": "VBN", "known": "VBN", "seen": "VBN", "gone": "VBN",
    "not": "RB", "very": "RB", "too": "RB", "also": "RB", "only": "RB",
    "to": "TO",
    "there": "EX", "who": "WP", "what": "WP", "which": "WDT",
    "when": "WRB", "where": "WRB", "how": "WRB", "why": "WRB",
}

_PUNCT_TAGS = {".": ".", "!": ".", "?": ".", ",": ",", ";": ":",
               ":": ":", "(": "-LRB-", ")": "-RRB-", '"': "''",
               "'": "''", "`": "``"}


def _pos_one(word: str, prev_tag: Optional[str], first: bool) -> str:
    low = word.lower()
    if word in _PUNCT_TAGS:
        return _PUNCT_TAGS[word]
    if not any(c.isalnum() for c in word):
        return "SYM"
    if word[0].isdigit():
        return "CD"
    if low in _CLOSED_CLASS:
        return _CLOSED_CLASS[low]
    if word[0].isupper() and not first:
        return "NNP"
    if low.endswith("ly"):
        return "RB"
    if low.endswith("ing") and len(low) > 4:
        return "VBG"
    if low.endswith("ed") and len(low) > 3:
        return "VBD"
    if prev_tag in ("MD", "TO") :
        return "VB"
    if low.endswith(("ous", "ful", "ive", "able", "ible", "al", "ic")) and len(low) > 4:
        return "JJ"
    if low.endswith("s") and not low.endswith(("ss", "us", "is")) and len(low) > 3:
        return "VBZ" if prev_tag in ("PRP", "NNP") else "NNS"
    return "NN"


def pos_tags(terms: Sequence[str]) -> List[str]:
    """One sentence of terms → Penn POS tags (the TYPE attribute)."""
    tags: List[str] = []
    prev: Optional[str] = None
    for i, w in enumerate(terms):
        t = _pos_one(w, prev, i == 0)
        tags.append(t)
        prev = t
    return tags


# ---------------------------------------------------------------------------
# Shallow chunking (OpenNLPChunkerFilter.java:31 analog; IOB labels)
# ---------------------------------------------------------------------------

_NP_TAGS = frozenset({"NN", "NNS", "NNP", "CD"})
_NP_PRE = frozenset({"DT", "PRP$", "JJ"})
_VP_TAGS = frozenset({"VB", "VBD", "VBG", "VBN", "VBP", "VBZ", "MD"})


def chunk_iob(terms: Sequence[str], tags: Sequence[str]) -> List[str]:
    """Finite-state NP/VP/PP grammar over the tag sequence:
    NP := (DT|PRP$)? JJ* (NN|NNS|NNP|CD)+ ; VP := MD? V+ ; PP := IN;
    pronouns are single-token NPs; everything else is O."""
    out: List[str] = []
    i, n = 0, len(tags)
    while i < n:
        t = tags[i]
        if t in _NP_PRE or t in _NP_TAGS or t == "PRP":
            if t == "PRP":
                out.append("B-NP")
                i += 1
                continue
            j = i
            while j < n and tags[j] in _NP_PRE:
                j += 1
            if j < n and tags[j] in _NP_TAGS:
                while j < n and tags[j] in _NP_TAGS:
                    j += 1
                out.append("B-NP")
                out.extend("I-NP" for _ in range(i + 1, j))
                i = j
                continue
            if t in _NP_TAGS:  # bare noun head
                out.append("B-NP")
                i += 1
                continue
            out.append("O")
            i += 1
            continue
        if t in _VP_TAGS:
            j = i + 1
            while j < n and tags[j] in _VP_TAGS:
                j += 1
            out.append("B-VP")
            out.extend("I-VP" for _ in range(i + 1, j))
            i = j
            continue
        if t == "IN" or t == "TO":
            out.append("B-PP")
            i += 1
            continue
        out.append("O")
        i += 1
    return out


# ---------------------------------------------------------------------------
# Lemmatization (OpenNLPLemmatizerFilter.java:50 analog)
# ---------------------------------------------------------------------------

_LEMMA_EXCEPTIONS = {
    ("was", "VBD"): "be", ("were", "VBD"): "be", ("is", "VBZ"): "be",
    ("are", "VBP"): "be", ("am", "VBP"): "be", ("been", "VBN"): "be",
    ("has", "VBZ"): "have", ("had", "VBD"): "have",
    ("does", "VBZ"): "do", ("did", "VBD"): "do", ("done", "VBN"): "do",
    ("men", "NNS"): "man", ("women", "NNS"): "woman",
    ("children", "NNS"): "child", ("people", "NNS"): "person",
    ("feet", "NNS"): "foot", ("teeth", "NNS"): "tooth",
    ("mice", "NNS"): "mouse", ("geese", "NNS"): "goose",
    ("ran", "VBD"): "run", ("went", "VBD"): "go", ("saw", "VBD"): "see",
    ("said", "VBD"): "say", ("made", "VBD"): "make", ("took", "VBD"): "take",
    ("wrote", "VBD"): "write", ("gave", "VBD"): "give",
    ("left", "VBD"): "leave", ("came", "VBD"): "come",
    ("got", "VBD"): "get", ("found", "VBD"): "find",
    ("knew", "VBD"): "know", ("thought", "VBD"): "think",
    ("written", "VBN"): "write", ("taken", "VBN"): "take",
    ("given", "VBN"): "give", ("known", "VBN"): "know",
    ("seen", "VBN"): "see", ("gone", "VBN"): "go",
}

_VOWELS = "aeiou"


def lemmatize(word: str, pos: str) -> str:
    """Dictionary first (the reference's dictionary lemmatizer wins over
    the model), then English inflection rules keyed by the POS tag."""
    low = word.lower()
    hit = _LEMMA_EXCEPTIONS.get((low, pos))
    if hit:
        return hit
    if pos == "NNS":
        if low.endswith("ies") and len(low) > 4:
            return low[:-3] + "y"
        if low.endswith(("ches", "shes", "sses", "xes", "zes")):
            return low[:-2]
        if low.endswith("s") and not low.endswith("ss"):
            return low[:-1]
        return low
    if pos in ("VBD", "VBN"):
        if low.endswith("ied") and len(low) > 4:
            return low[:-3] + "y"
        if low.endswith("ed") and len(low) > 3:
            stem = low[:-2]
            if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS + "ls":
                return stem[:-1]
            if stem.endswith(("at", "it", "ag", "iz", "is", "os", "ul", "ur", "bl")):
                return stem + "e"
            return stem
        return low
    if pos == "VBG" and low.endswith("ing") and len(low) > 4:
        stem = low[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS + "ls":
            return stem[:-1]
        if len(stem) > 1 and stem[-1] not in _VOWELS and stem[-2] in _VOWELS and len(stem) <= 3:
            return stem + "e"
        return stem
    if pos == "VBZ":
        if low.endswith("ies") and len(low) > 4:
            return low[:-3] + "y"
        if low.endswith(("ches", "shes", "sses", "xes", "zes")):
            return low[:-2]
        if low.endswith("s") and not low.endswith("ss"):
            return low[:-1]
    return low


# ---------------------------------------------------------------------------
# Full chain + Arrow entry points
# ---------------------------------------------------------------------------


def opennlp_analyze(text: str) -> List[Tuple[str, str, str, str, int]]:
    """Full chain: (term, pos, chunk, lemma, sentence_index) per token —
    the tokenizer -> POS filter -> chunker filter -> lemmatizer stack."""
    toks = opennlp_tokenize(text)
    out: List[Tuple[str, str, str, str, int]] = []
    i = 0
    while i < len(toks):
        si = toks[i][3]
        j = i
        while j < len(toks) and toks[j][3] == si:
            j += 1
        terms = [t[0] for t in toks[i:j]]
        tags = pos_tags(terms)
        chunks = chunk_iob(terms, tags)
        for (term, _, _, s), tag, ch in zip(toks[i:j], tags, chunks):
            out.append((term, tag, ch, lemmatize(term, tag), s))
        i = j
    return out


def sentences_udf():
    """pandas_udf: text → array<string> of sentences (one Arrow pass,
    no shuffle; the chunking pipeline's segmentation stage)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _sent(s):
        return s.map(lambda t: sentence_texts(t) if isinstance(t, str) else [])

    _sent.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_sent, "array<string>")


def pos_chunk_udf():
    """pandas_udf: text → array<struct<term,pos,chunk,lemma,sent>>."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _run(s):
        return s.map(
            lambda t: opennlp_analyze(t) if isinstance(t, str) else []
        )

    _run.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(
        _run,
        "array<struct<term:string,pos:string,chunk:string,lemma:string,sent:int>>",
    )
