"""Phonetic analysis: American Soundex (commons-codec semantics).

The reference's phonetic module
(`lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/PhoneticFilter.java:33`)
wraps the published commons-codec encoders; ``Soundex`` is the
classic: first letter + three digits, consonant classes 1-6, vowels
break duplicate-collapsing while H/W are transparent to it
(Ashcraft → A261, Tymczak → T522, Pfister → P236).

The encoder here is a pure expression chain — translate + a fixed
regexp-replace ladder — built twice from one table: a Spark Column
(Java regex) and a DuckDB SQL string (RE2). RE2 has no backreferences,
so the run-collapse step is six literal per-digit replaces instead of
``(\\d)\\1+``; both engines then produce byte-identical codes, which is
what makes the gates true differentials. Zero Python per row: the whole
encode stays inside whole-stage codegen.

Chain (validated against the commons-codec test vectors):

1. strip non-letters, uppercase;
2. translate A-Z → codes with H/W as sentinel ``9``;
3. drop 9s (makes codes adjacent across H/W), collapse runs per
   digit, drop 0s (vowels — AFTER collapsing, so vowels break runs);
4. if the first letter is a coded consonant its leading digit is its
   own run — drop it; prepend the letter; right-pad with 0 to 4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["soundex_col", "soundex_sql", "soundex", "phonetic_match"]

# A..Z -> digit; vowels+Y -> 0, H/W -> sentinel 9 (transparent to
# run-collapse), consonant classes 1-6
_MAP = "01230129022455012623019202"
_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def soundex_col(word: Column) -> Column:
    """Soundex code as a Spark Column (empty string for no-letter
    input)."""
    up = F.upper(F.regexp_replace(word, "[^a-zA-Z]", ""))
    seq = F.translate(up, _ALPHA, _MAP)
    s = F.regexp_replace(seq, "9", "")
    for d in "123456":
        s = F.regexp_replace(s, f"{d}{d}+", d)
    s = F.regexp_replace(s, "0", "")
    first_code = F.substring(seq, 1, 1)
    digits = F.when(
        first_code.isin(*list("123456")), F.substring(s, 2, 1000)
    ).otherwise(s)
    code = F.concat(
        F.substring(up, 1, 1), F.substring(F.concat(digits, F.lit("000")), 1, 3)
    )
    return F.when(up == "", F.lit("")).otherwise(code)


def soundex_sql(expr: str) -> str:
    """The SAME chain as :func:`soundex_col` in DuckDB SQL (RE2, 'g'
    flag), for oracle duals."""
    up = f"upper(regexp_replace({expr}, '[^a-zA-Z]', '', 'g'))"
    seq = f"translate({up}, '{_ALPHA}', '{_MAP}')"
    s = f"regexp_replace({seq}, '9', '', 'g')"
    for d in "123456":
        s = f"regexp_replace({s}, '{d}{d}+', '{d}', 'g')"
    s = f"regexp_replace({s}, '0', '', 'g')"
    digits = (
        f"CASE WHEN substr({seq}, 1, 1) IN ('1','2','3','4','5','6') "
        f"THEN substr({s}, 2) ELSE {s} END"
    )
    return (
        f"CASE WHEN {up} = '' THEN '' ELSE "
        f"substr({up}, 1, 1) || substr({digits} || '000', 1, 3) END"
    )


def soundex(word: str) -> str:
    """Driver-side scalar reference (same algorithm, for tests).

    Strip non-[a-zA-Z] BEFORE upper-casing, matching the column/SQL
    chains — upper-casing first would let case-expanding codepoints
    (ß → SS) survive the filter and encode differently."""
    up = "".join(c for c in word if c.isascii() and c.isalpha()).upper()
    if not up:
        return ""
    seq = "".join(_MAP[ord(c) - 65] for c in up)
    s = seq.replace("9", "")
    out = []
    for c in s:
        if not (out and out[-1] == c):
            out.append(c)
    digits = "".join(c for c in out if c != "0")
    if seq[0] in "123456":
        digits = digits[1:]
    return up[0] + (digits + "000")[:3]


def phonetic_match(
    df: DataFrame, word: str, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Docs containing any token that sounds like `word` — the
    PhoneticFilter-at-query-time shape (index the soundex of every
    token next to the token, equality-match the query's code). One
    explode + distinct; at scale the soundex column lives IN the terms
    table so this becomes a term lookup, not a scan."""
    target = soundex(word)
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    tok = df.select(F.col(id_col), F.explode(toks).alias("term"))
    return (
        tok.filter(soundex_col(F.col("term")) == F.lit(target))
        .select(id_col)
        .distinct()
    )


# ---------------------------------------------------------------------------
# RefinedSoundex / Caverphone 2.0 / NYSIIS — the other commons-codec
# encoders PhoneticFilter wraps (PhoneticFilterFactory.java:65 name
# registry). Python-side (memoized, Arrow-batched via
# `miscfilters.string_transform_udf`); vectors from
# TestPhoneticFilter.java:36-100.

# RefinedSoundex.US_ENGLISH mapping, A..Z
_REFINED_MAP = "01360240043788015936020505"


def refined_soundex(word: str) -> str:
    """commons-codec RefinedSoundex: first letter + one digit per
    letter with consecutive duplicate codes collapsed, no length cap
    (aaa → A0, easgasg → E034034)."""
    letters = [c for c in word.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = [letters[0]]
    last = None
    for c in letters:
        d = _REFINED_MAP[ord(c) - 65]
        if d != last:
            out.append(d)
        last = d
    return "".join(out)


# Caverphone 2.0 (David Hood, Caversham Project, University of Otago,
# 2004): the exact ordered rewrite ladder, padded to 10 with '1'.
_CAVER2_RULES = [
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
]


def caverphone2(word: str) -> str:
    """Caverphone 2.0 revised algorithm (commons-codec Caverphone2):
    lowercase+strip, the ordered rewrite ladder above, then pad/cut to
    exactly 10 chars with '1' (Darda/Datha → TTA1111111)."""
    import re as _re

    w = "".join(c for c in word.lower() if "a" <= c <= "z")
    for pat, rep in _CAVER2_RULES:
        w = _re.sub(pat, rep, w)
    return (w + "1" * 10)[:10]


_NY_VOWELS = frozenset("AEIOU")


def nysiis(word: str, strict: bool = True) -> str:
    """NYSIIS (New York State Identification and Intelligence System,
    1970; commons-codec Nysiis): prefix/suffix rewrites, per-letter
    translation with the EV/H/W context rules, consecutive-duplicate
    collapse, suffix cleanup; strict mode truncates to 6."""
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not w:
        return ""
    # prefix rewrites
    if w.startswith("MAC"):
        w = "MCC" + w[3:]
    elif w.startswith("KN"):
        w = "NN" + w[2:]
    elif w.startswith("K"):
        w = "C" + w[1:]
    elif w.startswith("PH") or w.startswith("PF"):
        w = "FF" + w[2:]
    elif w.startswith("SCH"):
        w = "SSS" + w[3:]
    # suffix rewrites
    if w.endswith("EE") or w.endswith("IE"):
        w = w[:-2] + "Y"
    elif w[-2:] in ("DT", "RT", "RD", "NT", "ND"):
        w = w[:-2] + "D"
    key = [w[0]]
    i = 1
    chars = list(w)
    while i < len(chars):
        c = chars[i]
        nxt = chars[i + 1] if i + 1 < len(chars) else ""
        if c in _NY_VOWELS:
            if c == "E" and nxt == "V":
                chars[i], chars[i + 1] = "A", "F"
            else:
                chars[i] = "A"
        elif c == "Q":
            chars[i] = "G"
        elif c == "Z":
            chars[i] = "S"
        elif c == "M":
            chars[i] = "N"
        elif c == "K":
            if nxt == "N":
                chars[i] = "N"
            else:
                chars[i] = "C"
        elif c == "S" and chars[i : i + 3] == ["S", "C", "H"]:
            chars[i : i + 3] = ["S", "S", "S"]
        elif c == "P" and nxt == "H":
            chars[i], chars[i + 1] = "F", "F"
        elif c == "H" and (
            chars[i - 1] not in _NY_VOWELS
            or (nxt and nxt not in _NY_VOWELS)
        ):
            chars[i] = chars[i - 1]
        elif c == "W" and chars[i - 1] in _NY_VOWELS:
            chars[i] = chars[i - 1]
        if chars[i] != key[-1]:
            key.append(chars[i])
        i += 1
    # suffix cleanup
    if key[-1] == "S" and len(key) > 1:
        key.pop()
    if len(key) >= 2 and key[-2:] == ["A", "Y"]:
        key = key[:-2] + ["Y"]
    if key[-1] == "A" and len(key) > 1:
        key.pop()
    s = "".join(key)
    return s[:6] if strict else s


__all__ += ["refined_soundex", "caverphone2", "nysiis"]
