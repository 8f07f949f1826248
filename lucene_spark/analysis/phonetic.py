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
