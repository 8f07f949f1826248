"""Synonym file-format parsers — SolrSynonymParser / WordnetSynonymParser.

References: `lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SolrSynonymParser.java:33` (the synonyms.txt format:
``a, b, c`` equivalence groups — all-pairs when ``expand``, everything
to the FIRST entry otherwise (including first→first, the legacy
token-type quirk, java:87-90); ``in1, in2 => out1, out2`` explicit
mappings that NEVER keep the original; ``#`` comments; ``\\``-escaped
delimiters) and `synonym/WordnetSynonymParser.java:26` (the prolog
``s(synsetid,num,'term',...)`` format: terms grouped by the synset id
at columns 2-11, ``''`` unescaping to ``'``, singleton synsets
skipped).

Output: rules ``(input, output, keep_orig)`` — the SynonymMap.add
surface — plus :func:`synonym_map` shaping them for
:func:`lucene_spark.analysis.filters.synonym_expand` (single-token
stacking; multi-word entries are space-joined and feed the lattice
consumer instead).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

__all__ = [
    "parse_solr_synonyms",
    "parse_wordnet_synonyms",
    "synonym_map",
]


def _split(s: str, separator: str) -> List[str]:
    """SolrSynonymParser.split: separator-aware, backslash keeps the
    NEXT char (and itself) out of separator matching."""
    out, sb, pos, end = [], [], 0, len(s)
    while pos < end:
        if s.startswith(separator, pos):
            if sb:
                out.append("".join(sb))
                sb = []
            pos += len(separator)
            continue
        ch = s[pos]
        pos += 1
        if ch == "\\":
            sb.append(ch)
            if pos >= end:
                break
            ch = s[pos]
            pos += 1
        sb.append(ch)
    if sb:
        out.append("".join(sb))
    return out


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _analyze(s: str) -> str:
    """The parser's analyze step for the whitespace/lowercase chain:
    trim, lowercase, collapse inner runs (multi-word entries stay
    space-joined for the lattice consumer)."""
    return " ".join(_unescape(s).strip().lower().split())


def parse_solr_synonyms(text: str, expand: bool = True) -> List[Tuple[str, str, bool]]:
    """synonyms.txt → [(input, output, keep_orig)] rules."""
    rules: List[Tuple[str, str, bool]] = []
    for ln, line in enumerate(text.splitlines(), 1):
        if not line or line[0] == "#":
            continue
        sides = _split(line, "=>")
        if len(sides) > 2:
            raise ValueError(
                f"invalid synonym rule at line {ln}: more than one "
                "explicit mapping specified on the same line"
            )
        if len(sides) == 2:
            inputs = [_analyze(x) for x in _split(sides[0], ",")]
            outputs = [_analyze(x) for x in _split(sides[1], ",")]
            for i in inputs:
                for o in outputs:
                    rules.append((i, o, False))
        else:
            inputs = [_analyze(x) for x in _split(line, ",")]
            if expand:
                for i, a in enumerate(inputs):
                    for j, b in enumerate(inputs):
                        if i != j:
                            rules.append((a, b, True))
            else:
                # all inputs (INCLUDING the first) map to the first —
                # the legacy type-flip behavior (java:87-90)
                for a in inputs:
                    rules.append((a, inputs[0], False))
    return rules


_WN_TERM = re.compile(r"'(.*)'")


def parse_wordnet_synonyms(text: str, expand: bool = True) -> List[Tuple[str, str, bool]]:
    """WordNet prolog (``s(100001740,1,'entity',n,1,11).``) → rules."""
    rules: List[Tuple[str, str, bool]] = []
    synset: List[str] = []
    last_id = ""

    def flush():
        if len(synset) <= 1:
            return
        if expand:
            for i, a in enumerate(synset):
                for j, b in enumerate(synset):
                    if i != j:
                        rules.append((a, b, True))
        else:
            for a in synset:
                rules.append((a, synset[0], False))

    for ln, line in enumerate(text.splitlines(), 1):
        if not line.strip():
            continue
        syn_id = line[2:11]
        if syn_id != last_id:
            flush()
            synset = []
        start = line.find("'") + 1
        end = line.rfind("'")
        if start <= 0 or end < start:
            raise ValueError(f"invalid synonym rule at line {ln}")
        term = line[start:end].replace("''", "'")
        synset.append(" ".join(term.strip().lower().split()))
        last_id = syn_id
    flush()
    return rules


def synonym_map(rules: List[Tuple[str, str, bool]]) -> Dict[str, List[str]]:
    """Rules → input→outputs map for ``synonym_expand`` (outputs
    deduped in first-seen order; identity rules dropped — the stacking
    filter re-emits the original itself)."""
    out: Dict[str, List[str]] = {}
    for i, o, _keep in rules:
        lst = out.setdefault(i, [])
        if o != i and o not in lst:
            lst.append(o)
    return {k: v for k, v in out.items() if v}
