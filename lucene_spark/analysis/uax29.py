"""UAX#29 word-break segmentation (StandardTokenizer semantics).

Re-implements the Unicode Text Segmentation word-break rules (UAX#29,
a public Unicode specification) the way the reference's
`analysis/standard/StandardTokenizerImpl.jflex` composes them into
tokens, replacing round 1-2's regex approximation:

- ALPHANUM/NUM: AHLetter / Numeric runs with MidLetter / MidNum /
  MidNumLet / Single·Double_Quote joins (WB5-WB13b), ExtendNumLet
  prefixes/suffixes/bridges, Hebrew-letter quote rules (WB7a-c);
- every class absorbs trailing (Extend | Format | ZWJ)* (WB4), and the
  absorbed marks stay part of the token text, as in the reference;
- KATAKANA runs; single-codepoint IDEOGRAPHIC (Script=Han) and
  HIRAGANA tokens (WB999);
- SOUTHEAST_ASIAN: runs of Line_Break=Complex_Context scripts (Thai,
  Lao, Myanmar, Khmer) kept together, per the reference's grammar
  comment block;
- EMOJI sequences per UTS#51 `emoji_sequence`: presentation/modifier
  sequences, ZWJ chains, keycaps, flag (RI RI) pairs, tag sequences.

Property tables are DERIVED at first use from `unicodedata` categories
plus explicit ranges for the classes categories cannot express
(Katakana/Hebrew/SEA scripts, Mid* punctuation sets, Regional
Indicators, Extended_Pictographic blocks) — all from the public UCD.
Known divergences from the generated JFlex tables (documented, golden
-tested): (a) property assignments for rare codepoints whose WB class
differs from their general category; (b) Python alternation is
approximated to JFlex longest-match by trying EMOJI and WORD at each
position and keeping the longer match, which still differs on
pathological overlaps like digits absorbing a following keycap mark
into a NUMERIC run.

ASCII inputs take a single-regex fast path (one C-level ``findall``),
byte-equivalent to the full scanner on ASCII. Mixed documents use
STRETCH DISPATCH (round 4): non-ASCII runs are expanded to the nearest
ASCII-whitespace boundaries ("islands"); the per-position rule scanner
runs only inside islands, while the pure-ASCII text between islands
keeps the C-level regex. ASCII whitespace is an unconditional break
point (no word-break rule's character class contains it, so no token
can span it), which makes the dispatch token-exact — a mostly-ASCII
web document with a few non-ASCII words tokenizes at near fast-path
throughput instead of falling off the ~21x per-position cliff.
"""

from __future__ import annotations

import re
import sys
import unicodedata
from functools import lru_cache
from typing import List

__all__ = ["uax29_tokenize", "uax29_tokenize_spans", "uax29_url_email_tokenize"]

# --- explicit ranges (public UCD data) -------------------------------------

_KATAKANA_RANGES = [
    (0x3031, 0x3035),  # vertical kana repeat marks
    (0x309B, 0x309C),  # voiced sound marks (WB: Katakana)
    (0x30A0, 0x30FA),
    (0x30FC, 0x30FF),
    (0x31F0, 0x31FF),
    (0x32D0, 0x32FE),
    (0x3300, 0x3357),
    (0xFF66, 0xFF70),
    (0xFF71, 0xFF9D),
    (0x1B000, 0x1B000),
]
_HIRAGANA_RANGES = [(0x3041, 0x3096), (0x309D, 0x309F), (0x1B001, 0x1B11F)]
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
_HEBREW_LETTER_RANGES = [
    (0x05D0, 0x05EA),
    (0x05EF, 0x05F2),
    (0xFB1D, 0xFB1D),
    (0xFB1F, 0xFB28),
    (0xFB2A, 0xFB36),
    (0xFB38, 0xFB3C),
    (0xFB3E, 0xFB3E),
    (0xFB40, 0xFB41),
    (0xFB43, 0xFB44),
    (0xFB46, 0xFB4F),
]
# Line_Break=Complex_Context scripts (letters/marks only; digits in
# these blocks are WB:Numeric)
_SEA_RANGES = [
    (0x0E01, 0x0E3A),  # Thai
    (0x0E40, 0x0E4E),
    (0x0E81, 0x0EBD),  # Lao
    (0x0EC0, 0x0ECD),
    (0x1000, 0x103F),  # Myanmar
    (0x1050, 0x108F),
    (0x109A, 0x109F),
    (0x1780, 0x17DD),  # Khmer
    (0x1950, 0x19DF),  # Tai Le / New Tai Lue
]
# Extended_Pictographic blocks (UTS#51); Regional Indicators excluded
_EXT_PICT_RANGES = [
    (0x00A9, 0x00A9),
    (0x00AE, 0x00AE),
    (0x203C, 0x203C),
    (0x2049, 0x2049),
    (0x2122, 0x2122),
    (0x2139, 0x2139),
    (0x2194, 0x2199),
    (0x21A9, 0x21AA),
    (0x231A, 0x231B),
    (0x2328, 0x2328),
    (0x23CF, 0x23CF),
    (0x23E9, 0x23FA),
    (0x24C2, 0x24C2),
    (0x25AA, 0x25AB),
    (0x25B6, 0x25B6),
    (0x25C0, 0x25C0),
    (0x25FB, 0x25FE),
    (0x2600, 0x27BF),
    (0x2934, 0x2935),
    (0x2B00, 0x2BFF),
    (0x3030, 0x3030),
    (0x303D, 0x303D),
    (0x3297, 0x3297),
    (0x3299, 0x3299),
    (0x1F000, 0x1F0FF),
    (0x1F10D, 0x1F10F),
    (0x1F201, 0x1F2FF),
    (0x1F300, 0x1F5FF),
    (0x1F600, 0x1F64F),
    (0x1F680, 0x1F6FF),
    (0x1F700, 0x1F7FF),
    (0x1F800, 0x1F8FF),
    (0x1F900, 0x1F9FF),
    (0x1FA00, 0x1FAFF),
    (0x1FB00, 0x1FBFF),
]
_EMOJI_MOD_BASE_RANGES = [  # Emoji_Modifier_Base (hands/people subset)
    (0x261D, 0x261D),
    (0x26F9, 0x26F9),
    (0x270A, 0x270D),
    (0x1F385, 0x1F385),
    (0x1F3C2, 0x1F3C4),
    (0x1F3C7, 0x1F3C7),
    (0x1F3CA, 0x1F3CC),
    (0x1F442, 0x1F443),
    (0x1F446, 0x1F450),
    (0x1F466, 0x1F478),
    (0x1F47C, 0x1F47C),
    (0x1F481, 0x1F483),
    (0x1F485, 0x1F487),
    (0x1F48F, 0x1F48F),
    (0x1F491, 0x1F491),
    (0x1F4AA, 0x1F4AA),
    (0x1F574, 0x1F575),
    (0x1F57A, 0x1F57A),
    (0x1F590, 0x1F590),
    (0x1F595, 0x1F596),
    (0x1F645, 0x1F647),
    (0x1F64B, 0x1F64F),
    (0x1F6A3, 0x1F6A3),
    (0x1F6B4, 0x1F6B6),
    (0x1F6C0, 0x1F6C0),
    (0x1F6CC, 0x1F6CC),
    (0x1F90C, 0x1F90C),
    (0x1F90F, 0x1F90F),
    (0x1F918, 0x1F91F),
    (0x1F926, 0x1F926),
    (0x1F930, 0x1F939),
    (0x1F93C, 0x1F93E),
    (0x1F977, 0x1F977),
    (0x1F9B5, 0x1F9B6),
    (0x1F9B8, 0x1F9B9),
    (0x1F9BB, 0x1F9BB),
    (0x1F9CD, 0x1F9DD),
]

_MIDLETTER = {0x003A, 0x00B7, 0x0387, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A}
_MIDNUM = {
    0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D, 0x066C, 0x07F8,
    0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B,
}
_MIDNUMLET = {0x002E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E}
_SINGLE_QUOTE = {0x0027}
_DOUBLE_QUOTE = {0x0022}
_RI = (0x1F1E6, 0x1F1FF)
_KEYCAP_BASE = set(b"0123456789#*")
_EMOJI_MODIFIER = (0x1F3FB, 0x1F3FF)


def _in_ranges(cp: int, ranges) -> bool:
    for lo, hi in ranges:
        if lo <= cp <= hi:
            return True
    return False


def _cls_of(cp: int) -> str:
    """Word_Break-ish class for one codepoint (derivation documented
    in the module docstring)."""
    if cp == 0x200D:
        return "zwj"
    ch = chr(cp)
    cat = unicodedata.category(ch)
    if cp in (0x000D, 0x000A, 0x000B, 0x000C, 0x0085, 0x2028, 0x2029):
        return "brk"
    if _EMOJI_MODIFIER[0] <= cp <= _EMOJI_MODIFIER[1]:
        return "emod"
    if cat in ("Mn", "Mc", "Me") or cp == 0x200C:
        return "extend"
    if cat == "Cf" and cp != 0x200B:
        return "format"
    if _RI[0] <= cp <= _RI[1]:
        return "ri"
    if _in_ranges(cp, _KATAKANA_RANGES):
        return "katakana"
    if _in_ranges(cp, _HIRAGANA_RANGES):
        return "hiragana"
    if _in_ranges(cp, _HAN_RANGES):
        return "han"
    if _in_ranges(cp, _HEBREW_LETTER_RANGES):
        return "hebrew"
    if _in_ranges(cp, _SEA_RANGES) and cat in ("Lo", "Lm"):
        return "sea"
    if cat == "Nd":
        return "numeric"
    if cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"):
        return "aletter"
    if cat == "Pc" or cp == 0x202F:
        return "extendnumlet"
    if cp in _MIDLETTER:
        return "midletter"
    if cp in _MIDNUM:
        return "midnum"
    if cp in _MIDNUMLET:
        return "midnumlet"
    if cp in _SINGLE_QUOTE:
        return "squote"
    if cp in _DOUBLE_QUOTE:
        return "dquote"
    if _in_ranges(cp, _EXT_PICT_RANGES):
        return "extpict"
    return "other"


def _esc(cp: int) -> str:
    return f"\\U{cp:08X}" if cp > 0xFFFF else f"\\u{cp:04X}"


@lru_cache(maxsize=1)
def _classes() -> dict:
    """class name → regex character-class body.

    Loads the precomputed tables (`_uax29_tables.py`, generated by
    `scripts/gen_uax29_tables.py`) when the shipped UCD version
    matches, avoiding a ~4s full-Unicode derivation pass per executor
    Python worker; otherwise derives from `unicodedata` directly."""
    try:
        from lucene_spark.analysis import _uax29_tables as t

        if t.UNIDATA_VERSION == unicodedata.unidata_version:
            return dict(t.CLASSES)
    except ImportError:
        pass
    return _derive_classes()


def _derive_classes() -> dict:
    """class name → regex character-class body, one pass over Unicode."""
    runs: dict = {}
    prev_cls, start = None, 0
    for cp in range(sys.maxunicode + 1):
        c = _cls_of(cp)
        if c != prev_cls:
            if prev_cls is not None and prev_cls not in ("other", "brk"):
                runs.setdefault(prev_cls, []).append((start, cp - 1))
            prev_cls, start = c, cp
    if prev_cls not in ("other", "brk"):
        runs.setdefault(prev_cls, []).append((start, sys.maxunicode))

    def body(names):
        parts = []
        for n in names:
            for lo, hi in runs.get(n, []):
                parts.append(_esc(lo) if lo == hi else f"{_esc(lo)}-{_esc(hi)}")
        return "".join(parts)

    return {n: body([n]) for n in runs} | {
        "efz": body(["extend", "format", "zwj", "emod"]),
        # emoji sequences absorb Extend/Format but NOT ZWJ (ZWJ drives
        # the sequence chain and must stay visible to it)
        "ef_nozwj": body(["extend", "format", "emod"]),
        "ahletter": body(["aletter", "hebrew"]),
        "midletterq": body(["midletter", "midnumlet", "squote"]),
        "midnumq": body(["midnum", "midnumlet", "squote"]),
        "emojichar": body(["extpict"]),
    }


@lru_cache(maxsize=1)
def _rules():
    c = _classes()
    EFZ = f"[{c['efz']}]*"
    # emoji absorb set excludes the presentation selectors FE0E/FE0F
    # (handled explicitly), mirroring ExtFmtZwjSansPresSel; Python re
    # has no class subtraction, so subtract via negative lookahead
    EFZS = f"(?:(?![\\uFE0E\\uFE0F])[{c['ef_nozwj']}])*"

    AHL = f"[{c['ahletter']}]{EFZ}"
    NUM = f"[{c['numeric']}]{EFZ}"
    KAT = f"[{c['katakana']}]{EFZ}"
    ENL = f"[{c['extendnumlet']}]{EFZ}"
    MIDL = f"[{c['midletterq']}]{EFZ}"
    MIDN = f"[{c['midnumq']}]{EFZ}"

    # WB7a-c (Hebrew quote rules), folded INTO the letter chain so the
    # backtracking matcher reaches them (Python regex is
    # leftmost-greedy, not longest-match; a separate HEB|AHL
    # alternation would stop at the double quote). The left-side
    # Hebrew-letter guard is a fixed-width lookbehind, checked through
    # at most one absorbed mark — deeper pointing runs before the
    # gershayim miss the join (documented divergence).
    heb_lb = (
        f"(?:(?<=[{c['hebrew']}])|(?<=[{c['hebrew']}][{c['efz']}]))"
    )
    DQJ = f'{heb_lb}"{EFZ}(?=[{c["hebrew"]}])'
    TRAILSQ = f"{heb_lb}'{EFZ}"

    inner = (
        f"(?:{KAT}(?:(?:{ENL})*{KAT})*"
        f"|(?:{NUM}(?:(?:(?:{ENL})*|{MIDN}){NUM})*"
        f"|{AHL}(?:(?:(?:{ENL})*|{MIDL}|{DQJ}){AHL})*(?:{TRAILSQ})?"
        f")+)"
    )
    word = f"(?:{ENL})*{inner}(?:(?:{ENL})+{inner})*(?:{ENL})*"

    ZWJ = "\\u200D"
    ECHAR = f"[{c['emojichar']}]{EFZS}"
    EMODB = "".join(
        _esc(lo) if lo == hi else f"{_esc(lo)}-{_esc(hi)}"
        for lo, hi in _EMOJI_MOD_BASE_RANGES
    )
    EMOD = f"[{_esc(_EMOJI_MODIFIER[0])}-{_esc(_EMOJI_MODIFIER[1])}]{EFZS}"
    ECPS = (
        f"(?:{ZWJ}*{ECHAR}\\uFE0F?"
        f"|(?:{ZWJ}*[{EMODB}]{EFZS})?{EMOD})"
    )
    RIX = f"[{_esc(_RI[0])}-{_esc(_RI[1])}]{EFZS}"
    KEYB = f"[0-9#*]{EFZS}"
    emoji = (
        f"(?:{ECPS}(?:(?:{ZWJ}{ECPS})*|[\\U000E0020-\\U000E007E]+\\U000E007F)"
        f"|{KEYB}\\uFE0F?\\u20E3{EFZS}"
        f"|{RIX}{RIX})"
    )

    sea = f"(?:[{c['sea']}]{EFZ})+"
    han = f"[{c['han']}]{EFZ}"
    hira = f"[{c['hiragana']}]{EFZ}"

    starters = (
        c["ahletter"] + c["numeric"] + c["katakana"] + c["extendnumlet"]
        + c["emojichar"] + c["sea"] + c["han"] + c["hiragana"]
        + f"{_esc(_RI[0])}-{_esc(_RI[1])}" + "0-9#*"
    )
    return {
        "word": re.compile(word),
        "emoji": re.compile(emoji),
        "sea": re.compile(sea),
        "han": re.compile(han),
        "hira": re.compile(hira),
        "skip": re.compile(f"[^{starters}]+"),
    }


# ASCII fast path: the full rule set restricted to ASCII collapses to
# one regex (classes: ALetter=[A-Za-z], Numeric=[0-9],
# ExtendNumLet=[_], MidLetter=[:], MidNum=[,;], MidNumLet=[.'],
# SingleQuote=[']; no Extend/Format/emoji below U+0080 except controls)
_ASCII_INNER = (
    r"(?:[0-9](?:(?:_*|[.,;'])[0-9])*"
    r"|[A-Za-z](?:(?:_*|[:.'])[A-Za-z])*)+"
)
_ASCII_WORD = re.compile(
    rf"_*{_ASCII_INNER}(?:_+{_ASCII_INNER})*_*"
)


# ASCII whitespace: every one of these maps to the scanner's
# "other"/"brk" class and belongs to NO token character class, so no
# word-break rule can join text across one — they are unconditional
# break points and therefore safe stretch-dispatch boundaries.
_ASCII_WS = " \t\n\r\f\v"
_NONASCII_RUN = re.compile(r"[^\x00-\x7F]+")
_WS_FWD = re.compile(f"[{_ASCII_WS}]")


def _islands(text: str):
    """Yield (start, end) spans covering every non-ASCII codepoint,
    each expanded outward to the nearest ASCII-whitespace boundary
    (or string edge). Spans are disjoint and ascending; the text
    between consecutive spans is pure ASCII and whitespace-bounded."""
    n = len(text)
    prev_end = 0  # right boundary of the last emitted island
    for m in _NONASCII_RUN.finditer(text):
        s = m.start()
        if s < prev_end:  # already inside the previous island
            continue
        a = max(text.rfind(ch, prev_end, s) for ch in _ASCII_WS) + 1
        a = max(a, prev_end)
        mw = _WS_FWD.search(text, m.end())
        b = mw.start() if mw else n
        yield (a, b)
        prev_end = b


def _rule_scan(text: str, pos: int, endpos: int):
    """Run the full rule scanner over text[pos:endpos], returning
    (token, start, end, rule) tuples with absolute offsets."""
    r = _rules()
    out = []
    while pos < endpos:
        m_skip = r["skip"].match(text, pos, endpos)
        if m_skip:
            pos = m_skip.end()
            continue
        # JFlex longest-match approximation: emoji vs word can overlap
        # (keycap digits); everything else is class-disjoint
        best, best_key = None, None
        for key in ("emoji", "word", "sea", "han", "hira"):
            m = r[key].match(text, pos, endpos)
            if m and m.end() > pos and (best is None or m.end() > best.end()):
                best, best_key = m, key
            if best is not None and key == "word":
                break  # sea/han/hira are disjoint from word+emoji starts
        if best is None:
            pos += 1
            continue
        out.append((best.group(0), pos, best.end(), best_key))
        pos = best.end()
    return out


def uax29_tokenize_spans(text: str):
    """Segment `text` into (token, start, end, rule) tuples — the
    offset/type surface consumers like the CJK bigram filter need
    (StandardTokenizer exposes the same via Offset/TypeAttribute).
    `rule` is the matched rule key: 'word', 'emoji', 'sea', 'han'
    (single IDEOGRAPHIC codepoint), or 'hira'."""
    if text.isascii():
        return [
            (m.group(0), m.start(), m.end(), "word")
            for m in _ASCII_WORD.finditer(text)
        ]
    out = []
    prev = 0
    for a, b in _islands(text):
        if a > prev:
            out.extend(
                (m.group(0), m.start(), m.end(), "word")
                for m in _ASCII_WORD.finditer(text, prev, a)
            )
        out.extend(_rule_scan(text, a, b))
        prev = b
    if prev < len(text):
        out.extend(
            (m.group(0), m.start(), m.end(), "word")
            for m in _ASCII_WORD.finditer(text, prev, len(text))
        )
    return out


def uax29_tokenize(text: str) -> List[str]:
    """Segment `text` into StandardTokenizer-equivalent tokens
    (type tags dropped — the chain only consumes the text)."""
    if text.isascii():
        return _ASCII_WORD.findall(text)
    out: List[str] = []
    prev = 0
    for a, b in _islands(text):
        if a > prev:
            out.extend(_ASCII_WORD.findall(text, prev, a))
        out.extend(t for t, _, _, _ in _rule_scan(text, a, b))
        prev = b
    if prev < len(text):
        out.extend(_ASCII_WORD.findall(text, prev, len(text)))
    return out


# --- UAX29URLEmailTokenizer analog -----------------------------------------

# Simplified RFC shapes (the reference's
# `analysis/email/UAX29URLEmailTokenizerImpl.jflex` embeds full RFC
# 3986/5321 grammars + the IANA TLD list; this re-expression keeps the
# practically-hit shapes: scheme URLs, www hosts, and local@domain
# emails — everything else falls through to the standard rules).
_URL_RE = (
    r"(?:https?|ftp)://[^\s<>\"']+"
    r"|www\.[A-Za-z0-9][A-Za-z0-9._-]*[A-Za-z0-9](?:/[^\s<>\"']*)?"
)
_EMAIL_RE = (
    r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]+@"
    r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)+"
)
_URL_EMAIL = re.compile(f"(?:{_URL_RE})|(?:{_EMAIL_RE})")


def uax29_url_email_tokenize(text: str) -> List[str]:
    """UAX29URLEmailTokenizer analog: URL and email tokens kept whole,
    the rest segmented by the standard rules."""
    out: List[str] = []
    pos = 0
    for m in _URL_EMAIL.finditer(text):
        out.extend(uax29_tokenize(text[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.extend(uax29_tokenize(text[pos:]))
    return out
