"""Hunspell dictionary stemming — core analog of the reference's
hunspell module.

Re-expresses the stemming path of
`lucene/analysis/common/src/java/org/apache/lucene/analysis/hunspell/Dictionary.java:77`
and `Stemmer.java` (used by ``HunspellStemFilter``): parse a ``.aff``
affix grammar + ``.dic`` wordlist and recover dictionary roots by
un-applying affix rules. Supported core (what real dictionaries rely
on for stemming):

- ``SFX``/``PFX`` rule groups: flag, cross-product marker, strip,
  append with optional continuation classes (``append/FLAGS``), and
  the condition pattern (character classes ``[ae]`` / ``[^ae]`` and
  ``.`` wildcards) anchored at the root's end (SFX) or start (PFX).
- twofold suffix stripping: an outer suffix is licensed only when its
  flag appears in the INNER suffix rule's continuation classes (this
  is what makes the reference's ``abcd`` fixture stem to nothing
  while ``abc`` stems to ``ab`` — `TestStemmer.java:39,45`).
- prefix × suffix cross products when BOTH groups carry ``Y``.
- ``FLAG long`` / ``FLAG num`` flag encodings; UTF-8 ``SET`` assumed.

NOT claimed: compounding (COMPOUNDRULE et al), suggestions,
ICONV/OCONV, morphological aliases — the reference implements those in
its spell-checker half; this module is the analysis-chain stemmer.

Scale shape: the dictionary parses once on the driver (wordlists are
MBs), is captured by closure into the Arrow analysis UDF, and every
lookup is a dict/set probe — per-token pure function, no shuffle.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import pandas as pd

__all__ = ["HunspellDictionary", "hunspell_stem_udf"]


class _Affix:
    __slots__ = ("flag", "strip", "append", "cont", "cond_re", "cross")

    def __init__(self, flag, strip, append, cont, cond, cross, suffix):
        self.flag = flag
        self.strip = strip
        self.append = append
        self.cont = cont
        self.cross = cross
        if cond in (".", ""):
            self.cond_re = None
        else:
            pat = cond.replace("-", r"\-")
            self.cond_re = re.compile(
                (pat + r"\Z") if suffix else (r"\A" + pat)
            )

    def matches_root(self, root: str) -> bool:
        return self.cond_re is None or bool(self.cond_re.search(root))


def _parse_flags(s: str, mode: str) -> Tuple[str, ...]:
    if not s:
        return ()
    if mode == "long":
        return tuple(s[i:i + 2] for i in range(0, len(s) - 1, 2))
    if mode == "num":
        return tuple(x.strip() for x in s.split(",") if x.strip())
    return tuple(s)


class HunspellDictionary:
    """Parsed affix grammar + wordlist; ``stem(word)`` → root list."""

    def __init__(self, aff_text: str, dic_text: str):
        self.flag_mode = "char"
        self.suffixes: List[_Affix] = []
        self.prefixes: List[_Affix] = []
        self._parse_aff(aff_text)
        # dic entries: surface -> list of flag tuples (homonyms keep
        # separate entries, like the reference's multiple foo/D foo/E)
        self.words: Dict[str, List[Tuple[str, ...]]] = {}
        self._parse_dic(dic_text)
        # index suffix rules by their append's last char (fast unapply)
        self._sfx_by_end: Dict[str, List[_Affix]] = {}
        for a in self.suffixes:
            key = a.append[-1] if a.append else ""
            self._sfx_by_end.setdefault(key, []).append(a)

    # -- parsing ----------------------------------------------------------
    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num"}.get(
                    parts[1], "char"
                )
            elif parts[0] in ("SFX", "PFX") and len(parts) >= 4:
                kind, flag, cross, cnt = (
                    parts[0], parts[1], parts[2] == "Y", int(parts[3])
                )
                for _ in range(cnt):
                    rp = lines[i].split()
                    i += 1
                    # SFX flag strip append[/cont] condition
                    strip = "" if rp[2] == "0" else rp[2]
                    app, _, conts = rp[3].partition("/")
                    app = "" if app == "0" else app
                    cond = rp[4] if len(rp) > 4 else "."
                    affix = _Affix(
                        flag, strip, app,
                        frozenset(_parse_flags(conts, self.flag_mode)),
                        cond, cross, suffix=(kind == "SFX"),
                    )
                    (self.suffixes if kind == "SFX"
                     else self.prefixes).append(affix)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for line in lines[1:]:  # first line is the count
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            word, _, flags = line.partition("/")
            word = word.replace("\\", "")
            self.words.setdefault(word, []).append(
                tuple(_parse_flags(flags, self.flag_mode))
            )

    # -- stemming ---------------------------------------------------------
    def _root_with_flag(self, cand: str, flag: str) -> List[str]:
        out = []
        for fl in self.words.get(cand, ()):
            if flag in fl:
                out.append(cand)
        return out

    def _unapply_sfx(self, word: str, a: _Affix) -> Optional[str]:
        if a.append:
            if not word.endswith(a.append) or len(word) <= len(a.append) - len(a.strip):
                return None
            root = word[: len(word) - len(a.append)] + a.strip
        else:
            root = word + a.strip
        if not root or not a.matches_root(root):
            return None
        return root

    def _unapply_pfx(self, word: str, a: _Affix) -> Optional[str]:
        if a.append:
            if not word.startswith(a.append):
                return None
            root = a.strip + word[len(a.append):]
        else:
            root = a.strip + word
        if not root or not a.matches_root(root):
            return None
        return root

    def stem(self, word: str) -> List[str]:
        """All dictionary roots for ``word`` (duplicates preserved for
        homonym entries, matching the reference's foo/D foo/E fixture)."""
        out: List[str] = []
        for _fl in self.words.get(word, ()):
            out.append(word)
        # single suffix, then twofold
        for outer in self.suffixes:
            c1 = self._unapply_sfx(word, outer)
            if c1 is None:
                continue
            out.extend(self._root_with_flag(c1, outer.flag))
            for inner in self.suffixes:
                if outer.flag not in inner.cont:
                    continue
                c2 = self._unapply_sfx(c1, inner)
                if c2 is not None:
                    out.extend(self._root_with_flag(c2, inner.flag))
        # prefix, and prefix×suffix cross products
        for pfx in self.prefixes:
            c1 = self._unapply_pfx(word, pfx)
            if c1 is None:
                continue
            out.extend(self._root_with_flag(c1, pfx.flag))
            if pfx.cross:
                for sfx in self.suffixes:
                    if not sfx.cross:
                        continue
                    c2 = self._unapply_sfx(c1, sfx)
                    if c2 is None:
                        continue
                    for fl in self.words.get(c2, ()):
                        if pfx.flag in fl and sfx.flag in fl:
                            out.append(c2)
        return out

    def stem_one(self, word: str) -> str:
        """First root, else the word itself (the HunspellStemFilter
        ``dedup`` single-output shape)."""
        st = self.stem(word)
        return st[0] if st else word


def hunspell_stem_udf(aff_text: str, dic_text: str):
    """Arrow-batched UDF: token → first dictionary root (or itself).

    Ships the .aff/.dic TEXT to executors and parses once per worker
    process (cheaper to serialize than the parsed structure, and
    avoids pickling compiled rule objects)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _stem(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        d = HunspellDictionary(aff_text, dic_text)
        cached = lru_cache(maxsize=200_000)(d.stem_one)
        for ser in it:
            yield ser.map(
                lambda t: cached(t) if isinstance(t, str) else t
            )

    return _stem
