"""Miscellaneous token filters: the remaining small analysis-chain
pieces of the reference's `analysis/common` miscellaneous + pattern
packages, as pure token(-list) functions suitable for Arrow UDF
composition.

- ``keep_word_tokens``        — miscellaneous/KeepWordFilter.java:31
- ``pattern_replace``         — pattern/PatternReplaceFilter.java:34
- ``pattern_capture_tokens``  — pattern/PatternCaptureGroupTokenFilter.java:56
  (head-merge emission order, preserveOriginal and whole-token-capture
  rules reproduced from the state machine)
- ``truncate_token``          — miscellaneous/TruncateTokenFilter.java:29
- ``capitalize_token``        — miscellaneous/CapitalizationFilter.java:37
  (word split on control/space/'.', the skip-a-char quirk included)
- ``remove_duplicate_tokens`` — miscellaneous/RemoveDuplicatesTokenFilter.java:29
- ``limit_token_count``       — miscellaneous/LimitTokenCountFilter.java:33
- ``keep_types``              — core/TypeTokenFilter.java:29
- ``delimited_term_frequency``— miscellaneous/DelimitedTermFrequencyTokenFilter.java:39
- ``stemmer_override``        — miscellaneous/StemmerOverrideFilter.java:36
- ``hyphenated_words``        — miscellaneous/HyphenatedWordsFilter.java:51
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import pandas as pd

__all__ = [
    "keep_word_tokens",
    "pattern_replace",
    "pattern_capture_tokens",
    "truncate_token",
    "capitalize_token",
    "remove_duplicate_tokens",
    "limit_token_count",
    "keep_types",
    "delimited_term_frequency",
    "stemmer_override",
    "hyphenated_words",
    "string_transform_udf",
    "SEP_LABEL",
    "concatenate_graph_paths",
]


def keep_word_tokens(
    tokens: Sequence[str], keep, ignore_case: bool = False
) -> List[str]:
    """KeepWordFilter: the inverse of a stop filter."""
    if ignore_case:
        keep = {w.lower() for w in keep}
        return [t for t in tokens if t.lower() in keep]
    keep = set(keep)
    return [t for t in tokens if t in keep]


def pattern_replace(
    token: str, pattern: str, replacement: str, replace_all: bool = True
) -> str:
    """PatternReplaceFilter: regex substitution inside a token
    (replaceAll vs replaceFirst)."""
    return re.sub(pattern, replacement, token, count=0 if replace_all else 1)


def pattern_capture_tokens(
    token: str,
    patterns: Sequence[str],
    preserve_original: bool = False,
) -> List[str]:
    """PatternCaptureGroupTokenFilter: one token per capture group per
    match, merged across patterns by capture start offset (the
    reference's min-offset head selection). Empty captures never emit;
    a capture equal to the whole token is skipped only when the
    original is preserved; with no captures the token passes whole."""
    streams: List[List[Tuple[int, str]]] = []
    n = len(token)
    for p in patterns:
        rx = re.compile(p)
        seq: List[Tuple[int, str]] = []
        for m in rx.finditer(token):
            for g in range(1, rx.groups + 1):
                s, e = m.span(g)
                if s == -1 or s == e:
                    continue
                if preserve_original and s == 0 and e == n:
                    continue
                seq.append((s, token[s:e]))
        streams.append(seq)

    out: List[str] = [token] if preserve_original else []
    heads = [0] * len(streams)
    while True:
        best = -1
        best_start = n + 1
        for i, seq in enumerate(streams):
            if heads[i] < len(seq) and seq[heads[i]][0] < best_start:
                best_start = seq[heads[i]][0]
                best = i
        if best == -1:
            break
        out.append(streams[best][heads[best]][1])
        heads[best] += 1
    if not out:
        return [token]
    return out


def truncate_token(token: str, length: int) -> str:
    """TruncateTokenFilter: hard prefix cut."""
    if length < 1:
        raise ValueError("length must be greater than zero")
    return token[:length]


def capitalize_token(
    token: str,
    only_first_word: bool = True,
    keep: Optional[Sequence[str]] = None,
    force_first_letter: bool = True,
    ok_prefix: Optional[Sequence[str]] = None,
    min_word_length: int = 0,
    max_word_count: int = 2**31 - 1,
    max_token_length: int = 2**31 - 1,
) -> str:
    """CapitalizationFilter.incrementToken + processWord, including the
    buffer-scan quirk (the char after a separator that closed a word is
    skipped, so double separators don't restart words) and the
    max_word_count backup-restore."""
    if min_word_length < 0:
        raise ValueError("minWordLength must be >= 0")
    if max_word_count < 1 or max_token_length < 1:
        raise ValueError("maxWordCount/maxTokenLength must be > 0")
    if len(token) >= max_token_length:
        return token
    buf = list(token)
    keep_set = set(keep) if keep else None

    def process(off: int, length: int, word_count: int) -> None:
        if length < 1:
            return
        if only_first_word and word_count > 0:
            for k in range(off, off + length):
                buf[k] = buf[k].lower()
            return
        word = "".join(buf[off : off + length])
        if keep_set is not None and word in keep_set:
            if word_count == 0 and force_first_letter:
                buf[off] = buf[off].upper()
            return
        if length < min_word_length:
            return
        if ok_prefix:
            for pre in ok_prefix:
                if length >= len(pre) and word.startswith(pre):
                    return
        buf[off] = buf[off].upper()
        for k in range(off + 1, off + length):
            buf[k] = buf[k].lower()

    word_count = 0
    last_start = 0
    i = 0
    while i < len(buf):
        c = buf[i]
        if c <= " " or c == ".":
            ln = i - last_start
            if ln > 0:
                process(last_start, ln, word_count)
                word_count += 1
                last_start = i + 1
                i += 1  # the reference's i++ inside the branch
        i += 1
    if last_start < len(buf):
        process(last_start, len(buf) - last_start, word_count)
        word_count += 1
    if word_count > max_word_count:
        return token
    return "".join(buf)


def remove_duplicate_tokens(
    tokens: Sequence[Tuple[str, int]],
) -> List[Tuple[str, int]]:
    """RemoveDuplicatesTokenFilter over (term, position) pairs: drop a
    token whose term already appeared at the same position."""
    out: List[Tuple[str, int]] = []
    seen: set = set()
    prev_pos = None
    for term, pos in tokens:
        if pos != prev_pos:
            seen = set()
            prev_pos = pos
        if term in seen:
            continue
        seen.add(term)
        out.append((term, pos))
    return out


def limit_token_count(tokens: Sequence[str], max_count: int) -> List[str]:
    """LimitTokenCountFilter: keep the first max_count tokens."""
    if max_count < 1:
        raise ValueError("maxTokenCount must be greater than zero")
    return list(tokens[:max_count])


def keep_types(
    tokens: Sequence[Tuple[str, str]],
    types: Sequence[str],
    use_whitelist: bool = True,
) -> List[str]:
    """TypeTokenFilter over (term, type) pairs: keep (whitelist) or
    drop (blacklist) the given types."""
    tset = set(types)
    if use_whitelist:
        return [t for t, ty in tokens if ty in tset]
    return [t for t, ty in tokens if ty not in tset]


def delimited_term_frequency(
    token: str, delimiter: str = "|"
) -> Tuple[str, int]:
    """DelimitedTermFrequencyTokenFilter: ``term|3`` → ("term", 3);
    no delimiter → tf 1."""
    idx = token.rfind(delimiter)
    if idx < 0:
        return token, 1
    tf = int(token[idx + 1 :])
    if tf < 1:
        raise ValueError("term frequency must be 1 or greater")
    return token[:idx], tf


def stemmer_override(
    token: str,
    overrides: Dict[str, str],
    stemmer: Optional[Callable[[str], str]] = None,
) -> str:
    """StemmerOverrideFilter: dictionary hit wins and marks the token
    as keyword (the downstream stemmer is bypassed)."""
    hit = overrides.get(token)
    if hit is not None:
        return hit
    return stemmer(token) if stemmer is not None else token


def hyphenated_words(tokens: Sequence[str]) -> List[str]:
    """HyphenatedWordsFilter: a token ending in '-' joins the next
    token(s); a stream-final dangling part keeps its hyphen."""
    out: List[str] = []
    pending: List[str] = []
    for t in tokens:
        if t.endswith("-") and len(t) > 0:
            pending.append(t[:-1])
        elif pending:
            pending.append(t)
            out.append("".join(pending))
            pending = []
        else:
            out.append(t)
    if pending:
        out.append("".join(pending) + "-")
    return out


def string_transform_udf(fn: Callable[[str], str]):
    """Arrow-batched string→string projection for any of the filters
    above (composed as plain closures)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fn(t) if isinstance(t, str) else t)

    return _f


def date_recognizer(
    tokens: Sequence[str],
    formats: Sequence[str] = ("%b %d, %Y", "%B %d, %Y"),
) -> List[str]:
    """DateRecognizerFilter (`miscellaneous/DateRecognizerFilter.java:28`):
    keep only tokens parseable as dates.  The reference's default is
    ``DateFormat.getDateInstance(DEFAULT, ENGLISH)`` ("Jan 12, 1952");
    pass ``formats`` (strptime patterns) the way the factory takes a
    datePattern."""
    from datetime import datetime

    out: List[str] = []
    for t in tokens:
        for fmt in formats:
            try:
                datetime.strptime(t, fmt)
                out.append(t)
                break
            except ValueError:
                continue
    return out


def protected_term(
    tokens: Sequence[str],
    protected: Sequence[str],
    fn: Callable[[str], str],
) -> List[str]:
    """ProtectedTermFilter (`miscellaneous/ProtectedTermFilter.java:33`):
    the wrapped filter runs only on tokens NOT in the protected set —
    a ConditionalTokenFilter specialization keyed on term membership."""
    pset = set(protected)
    return [t if t in pset else fn(t) for t in tokens]


def flatten_graph(
    tokens: Sequence[Tuple],
) -> List[Tuple[str, int, int, int, int]]:
    """FlattenGraphFilter (`core/FlattenGraphFilter.java:17`): squash a
    token GRAPH (SynonymGraphFilter output, where side paths span
    multiple positions) into a flat "sausage" the indexer can consume.

    Input/output tokens are ``(term, pos_inc, pos_len, start, end)``
    (offsets optional on input, defaulted 0).  Node mapping mirrors the
    reference: ``out(to) = max over incoming tokens of out(from) + 1``;
    a node no token enters (a HOLE — e.g. a deleted stopword) maps to
    ``out(prev) + (node - prev)`` so the hole's positionIncrement
    survives (TestFlattenGraphFilter.testSimpleHole); input node ids
    with no tokens at all are skipped, NOT holes
    (testStrangelyNumberedNodes).  Every output token gets
    ``pos_len = max(1, out(to) - out(from))`` — side paths align with
    the main path.  Offsets pass through unchanged (the reference
    additionally clamps them to output-node bounds for multi-word
    spans; single-field web text never hits that corner here).
    """
    if not tokens:
        return []
    norm = []
    pos = -1
    for t in tokens:
        term, inc, plen = t[0], int(t[1]), int(t[2])
        start, end = (int(t[3]), int(t[4])) if len(t) >= 5 else (0, 0)
        pos += inc
        norm.append((term, pos, pos + plen, start, end))

    incoming: Dict[int, List[int]] = {}
    nodes = set()
    for _, f, to, _, _ in norm:
        nodes.add(f)
        nodes.add(to)
        incoming.setdefault(to, []).append(f)

    out: Dict[int, int] = {}
    prev = None
    for n in sorted(nodes):
        if prev is None:
            # a LEADING hole (first token's pos_inc > 1) must survive:
            # the first node keeps its absolute offset from position 0
            out[n] = n
        elif n in incoming:
            out[n] = max(out[f] + 1 for f in incoming[n])
        else:
            out[n] = out[prev] + (n - prev)  # hole: width preserved
        prev = n

    order = sorted(range(len(norm)), key=lambda i: (out[norm[i][1]], i))
    result: List[Tuple[str, int, int, int, int]] = []
    last_pos = -1
    for i in order:
        term, f, to, start, end = norm[i]
        p = out[f]
        result.append((term, p - last_pos if p != last_pos else 0,
                       max(1, out[to] - p), start, end))
        last_pos = p
    return result


SEP_LABEL = "\u001f"  # ConcatenateGraphFilter.SEP_LABEL (POS_SEP)


def concatenate_graph_paths(
    tokens,
    token_separator: Optional[str] = SEP_LABEL,
    preserve_position_increments: bool = True,
    max_graph_expansions: int = 10000,
):
    """ConcatenateGraphFilter analog (`analysis/common/.../miscellaneous/
    ConcatenateGraphFilter.java:45`): the token-stream GRAPH becomes an
    automaton whose accepted strings are enumerated — one output string
    per distinct path, tokens joined by ``token_separator`` (U+001F,
    the reference's SEP_LABEL; ``None`` concatenates directly, and
    identical accepted strings dedupe exactly like the automaton).

    tokens: (term, pos_inc, pos_length) triples.  A hole (pos_inc > 1)
    contributes an empty position — two consecutive separators — when
    ``preserve_position_increments`` (the reference default), else it
    collapses.  More than ``max_graph_expansions`` paths raises,
    mirroring TooComplexToDeterminizeException.  Output is sorted
    (the automaton's finite-strings enumeration is label-ordered).
    """
    edges: Dict[int, list] = {}  # node -> [(term, dest)]
    pos = -1
    max_node = 0
    for term, pos_inc, pos_length in tokens:
        if pos_length < 1:
            # PositionLengthAttribute rejects posLength < 1; without
            # this the DFS would self-loop forever on a 0-length edge
            raise ValueError("pos_length must be >= 1")
        if not preserve_position_increments and pos_inc > 1:
            pos_inc = 1
        if pos < 0 and pos_inc <= 0:
            raise ValueError("first token must have a positive increment")
        if pos_inc > 1:
            # holes: one empty position per skipped slot
            for h in range(pos + 1, pos + pos_inc):
                edges.setdefault(h, []).append(("", h + 1))
            pos += pos_inc
        elif pos_inc > 0:
            pos += 1
        dest = pos + int(pos_length)
        edges.setdefault(pos, []).append((term, dest))
        max_node = max(max_node, dest)
    if pos < 0:
        return []
    sep = token_separator if token_separator is not None else ""
    out = set()
    stack = [(0, [])]
    while stack:
        node, parts = stack.pop()
        if node == max_node:
            out.add(sep.join(parts))
            if len(out) > max_graph_expansions:
                raise ValueError(
                    "too many graph expansions "
                    f"(> {max_graph_expansions}): too complex to determinize"
                )
            continue
        for term, dest in edges.get(node, ()):
            stack.append((dest, parts + [term]))
    return sorted(out)
