"""IndicNormalizer (in/IndicNormalizer.java:40): canonical
composition of Indian-script text per Unicode 5.2 ch. 6 and the LDC
graphical-decomposition list.

Nine script blocks (Devanagari, Bengali, Gurmukhi, Gujarati, Oriya,
Tamil, Telugu, Kannada, Malayalam) share one decomposition table of
(ch1, ch2, ch3, composed, script-flags) rows, expressed as offsets
into each script's codepage; 0xFF in the ch3 slot means zero-width
joiner. The reference's HindiAnalyzer and BengaliAnalyzer both apply
this filter before their language-specific normalizers, and
``lightstem.light_analyze`` mirrors that chain order for hi/bn.

The table below is machine-extracted from the reference source with
the flag() ORs resolved to the integer masks.
"""

from __future__ import annotations

__all__ = ["indic_normalize", "telugu_normalize", "telugu_stem"]

# (script flag, codepage base) — Character.UnicodeBlock equivalents
_SCRIPTS = (
    (1, 0x0900),    # Devanagari
    (2, 0x0980),    # Bengali
    (4, 0x0A00),    # Gurmukhi
    (8, 0x0A80),    # Gujarati
    (16, 0x0B00),   # Oriya
    (32, 0x0B80),   # Tamil
    (64, 0x0C00),   # Telugu
    (128, 0x0C80),  # Kannada
    (256, 0x0D00),  # Malayalam
)

# (ch1, ch2, ch3, composed, flags) — offsets into the script codepage
_DECOMPOSITIONS = (
    (5, 62, 69, 17, 9),
    (5, 62, 70, 18, 1),
    (5, 62, 71, 19, 9),
    (5, 62, 72, 20, 9),
    (5, 62, -1, 6, 31),
    (5, 69, -1, 114, 1),
    (5, 69, -1, 13, 8),
    (5, 70, -1, 4, 1),
    (5, 71, -1, 15, 8),
    (5, 72, -1, 16, 12),
    (5, 73, -1, 17, 9),
    (5, 74, -1, 18, 1),
    (5, 75, -1, 19, 9),
    (5, 76, -1, 20, 13),
    (6, 69, -1, 17, 9),
    (6, 70, -1, 18, 1),
    (6, 71, -1, 19, 9),
    (6, 72, -1, 20, 9),
    (7, 87, -1, 8, 256),
    (9, 65, -1, 10, 1),
    (9, 87, -1, 10, 288),
    (14, 70, -1, 16, 256),
    (15, 69, -1, 13, 1),
    (15, 70, -1, 14, 1),
    (15, 71, -1, 16, 1),
    (15, 87, -1, 16, 16),
    (18, 62, -1, 19, 256),
    (18, 76, -1, 20, 192),
    (18, 85, -1, 19, 64),
    (18, 87, -1, 20, 288),
    (19, 87, -1, 20, 16),
    (21, 60, -1, 88, 1),
    (22, 60, -1, 89, 5),
    (23, 60, -1, 90, 5),
    (28, 60, -1, 91, 5),
    (33, 60, -1, 92, 19),
    (34, 60, -1, 93, 19),
    (35, 77, 255, 122, 256),
    (36, 77, 255, 78, 2),
    (40, 60, -1, 41, 1),
    (40, 77, 255, 123, 256),
    (43, 60, -1, 94, 5),
    (47, 60, -1, 95, 3),
    (44, 65, 65, 11, 64),
    (48, 60, -1, 49, 1),
    (48, 77, 255, 124, 256),
    (50, 77, 255, 125, 256),
    (51, 60, -1, 52, 1),
    (51, 77, 255, 126, 256),
    (53, 65, -1, 46, 64),
    (62, 69, -1, 73, 9),
    (62, 70, -1, 74, 1),
    (62, 71, -1, 75, 9),
    (62, 72, -1, 76, 9),
    (63, 85, -1, 64, 128),
    (65, 65, -1, 66, 4),
    (70, 62, -1, 74, 288),
    (70, 66, 85, 75, 128),
    (70, 66, -1, 74, 128),
    (70, 70, -1, 72, 256),
    (70, 85, -1, 71, 192),
    (70, 86, -1, 72, 192),
    (70, 87, -1, 76, 288),
    (71, 62, -1, 75, 306),
    (71, 87, -1, 76, 18),
    (74, 85, -1, 75, 128),
    (114, 63, -1, 7, 4),
    (114, 64, -1, 8, 4),
    (114, 71, -1, 15, 4),
    (115, 65, -1, 9, 4),
    (115, 66, -1, 10, 4),
    (115, 75, -1, 19, 4),
)

# per-script set of first-char offsets that can start a composition
_DECOMP_MASK = {
    flag: frozenset(
        d[0] for d in _DECOMPOSITIONS if d[4] & flag
    )
    for flag, _ in _SCRIPTS
}


def _script_of(cp: int):
    for flag, base in _SCRIPTS:
        if base <= cp < base + 0x80:
            return flag, base
    return None


def indic_normalize(word: str) -> str:
    """normalize (IndicNormalizer.java:253): left-to-right scan; at
    each position whose offset starts a decomposition for its script,
    try the table rows in order and compose the first match (deleting
    one or two following chars)."""
    s = list(word)
    i = 0
    while i < len(s):
        sc = _script_of(ord(s[i]))
        if sc is not None:
            flag, base = sc
            ch0 = ord(s[i]) - base
            if ch0 in _DECOMP_MASK[flag] and i + 1 < len(s):
                ch1 = ord(s[i + 1]) - base
                sc1 = _script_of(ord(s[i + 1]))
                if sc1 is not None and sc1[0] == flag:
                    ch2 = -1
                    if i + 2 < len(s):
                        if s[i + 2] == "\u200d":      # ZWJ
                            ch2 = 0xFF
                        else:
                            sc2 = _script_of(ord(s[i + 2]))
                            if sc2 is not None and sc2[0] == flag:
                                ch2 = ord(s[i + 2]) - base
                    for d0, d1, d2, res, flags in _DECOMPOSITIONS:
                        if d0 == ch0 and (flags & flag):
                            if d1 == ch1 and (d2 < 0 or d2 == ch2):
                                s[i] = chr(base + res)
                                del s[i + 1]
                                if d2 >= 0:
                                    del s[i + 1]
                                break
        i += 1
    return "".join(s)


# --- Telugu (te/TeluguNormalizer.java:27, te/TeluguStemmer.java:24) --------

def telugu_normalize(word: str) -> str:
    """TeluguNormalizer.normalize: candrabindu→bindu, visarga/ZWJ/ZWNJ
    deletion, long→short vowels and matras, decomposed diphthong and
    oo/au composition — one left-to-right pass with the reference's
    exact revisit-after-delete behavior."""
    s = list(word)
    i = 0
    simple = {
        "ఀ": "ం", "ఁ": "ం",  # candrabindu -> bindu
        "ఔ": "ఓ", "ఐ": "ఏ",  # long -> short vowels
        "ఆ": "అ", "ఈ": "ఇ", "ఊ": "ఉ",
        "ీ": "ి", "ూ": "ు",  # long -> short matras
        "ే": "ె", "ో": "ొ",
    }
    while i < len(s):
        c = s[i]
        if c in ("\u0c03", "\u200c", "\u200d"):  # visarga, zwnj, zwj
            del s[i]
            continue
        if c == "ె" and i + 1 < len(s) and s[i + 1] == "ౖ":
            s[i] = "ై"                      # decomposed ai matra
            del s[i + 1]
            i += 1
            continue
        if c == "ఒ" and i + 1 < len(s):
            if s[i + 1] == "ౕ":             # o + length mark -> oo
                s[i] = "ఓ"
                del s[i + 1]
                i += 1
                continue
            if s[i + 1] == "ౌ":             # o + au matra -> au
                s[i] = "ఔ"
                del s[i + 1]
                i += 1
                continue
        if c in simple:
            s[i] = simple[c]
        i += 1
    return "".join(s)


_TE_SUF4 = ("ళ్ళు", "డ్లు")  # ళ్ళు డ్లు
_TE_SUF2 = (
    "డు", "ము", "వు", "లు",
    "ని", "ను", "చే", "కై",
    "లో", "ది", "కి", "సు",
    "వై", "పై",
)  # డు ము వు లు ని ను చే కై లో ది కి సు వై పై
_TE_SUF1 = tuple("ిీుూెేొోా")


def telugu_stem(word: str) -> str:
    """TeluguStemmer.stem: longest-first suffix strip with the
    reference's exact length guards (len>5 / >3 / >2)."""
    n = len(word)
    if n > 5 and word.endswith(_TE_SUF4):
        return word[:-4]
    if n > 3 and word.endswith(_TE_SUF2):
        return word[:-2]
    if n > 2 and word.endswith(_TE_SUF1):
        return word[:-1]
    return word
