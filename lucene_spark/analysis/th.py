"""Thai word segmentation — ThaiTokenizer/ThaiAnalyzer analogs.

Re-expresses the reference's Thai chain
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/th/ThaiTokenizer.java:36`:
a dictionary-based ICU ``BreakIterator`` segments Thai runs while
non-Thai stretches take the UAX#29 word rules;
`th/ThaiAnalyzer.java`: tokenizer → LowerCaseFilter → StopFilter with
`th/stopwords.txt`).

Like the ja/ko/zh modules this is a 🟡 documented-approximation: the
segmenter is dictionary-driven dynamic programming (minimize
(unknown-chars, token-count) lexicographically — classic maximal
matching) over a compact hand-curated lexicon, NOT ICU's shipped
Thai dictionary; out-of-lexicon stretches surface as single unknown
runs rather than ICU's statistical splits. Non-Thai stretches reuse
the repo's own UAX#29 scanner (`analysis/uax29.py` already classes
Thai as an SEA span), so mixed-script behavior matches the reference
fixtures (`TestThaiAnalyzer.java:41,89`): ``XY&Z`` → xy, z and
``xyz@demo.com`` → xyz, demo.com.

Scale shape: per-sentence pure function inside the existing
Arrow-batched analysis UDFs — zero extra Spark stages, no shuffle.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator, List, Tuple

import pandas as pd

__all__ = ["thai_segment", "thai_tokenize", "thai_analyze", "THAI_STOP",
           "thai_tokens_udf"]

# compact hand-curated lexicon (high-frequency words + the reference
# fixture vocabulary); NOT the ICU dictionary
_TH_WORDS = frozenset((
    "การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี",
    "บริษัท", "ชื่อ", "คุย", "กับ",
    "ประเทศ", "ไทย", "มี", "ภาษา", "ฉัน", "กิน", "ข้าว", "บ้าน",
    "เด็ก", "นักเรียน", "ไป", "โรงเรียน", "น้ำ", "ใน", "ของ", "คน",
    "มาก", "รัก", "หนังสือ", "อ่าน", "เขียน", "ทำ", "เรา", "เขา",
    "และ", "หรือ", "แต่", "จะ", "ไม่", "ให้", "มา", "อยู่", "เป็น",
    "นี้", "นั้น", "ก็", "ถึง", "จาก", "โดย", "เมื่อ", "เพราะ",
    "ช่วย", "เวลา", "วัน", "ปี", "เมือง", "รถ", "ใหม่", "เก่า",
    "ใหญ่", "เล็ก", "สวย", "เรียน", "สอน", "ซื้อ", "ขาย", "เงิน",
    "ตลาด", "อาหาร", "ร้าน", "เพื่อน", "ครู", "หมอ", "ข่าว", "รู้",
    "เห็น", "พูด", "ฟัง", "เดิน", "วิ่ง", "นอน", "เล่น", "ดู", "หา",
    "ใช้", "เปิด", "ปิด", "รับ", "ส่ง", "คิด", "เข้าใจ", "สำคัญ",
))
_TH_MAXLEN = max(len(w) for w in _TH_WORDS)

THAI_STOP = frozenset((
    # th/stopwords.txt high-frequency subset (incl. the five the
    # reference's testStopWords fixture relies on)
    "การ", "ที่", "ได้", "ต้อง", "ว่า", "ใน", "ของ", "และ", "หรือ",
    "แต่", "จะ", "ไม่", "ให้", "มา", "อยู่", "เป็น", "นี้", "นั้น",
    "ก็", "ถึง", "จาก", "โดย", "เมื่อ", "เพราะ", "เรา", "เขา", "มี",
))


def _is_thai(ch: str) -> bool:
    return "฀" <= ch <= "๿"


@lru_cache(maxsize=65536)
def thai_segment(run: str) -> Tuple[str, ...]:
    """Segment one pure-Thai run: DP minimizing (unknown_chars,
    n_tokens); adjacent unknown single chars merge into one run."""
    n = len(run)
    INF = (10**9, 10**9)
    best = [INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = (0, 0)
    for i in range(1, n + 1):
        # unknown single char
        u, t = best[i - 1]
        cand = (u + 1, t + 1)
        if cand < best[i]:
            best[i] = cand
            back[i] = i - 1
        for ln in range(2, min(_TH_MAXLEN, i) + 1):
            j = i - ln
            if run[j:i] in _TH_WORDS:
                u, t = best[j]
                cand = (u, t + 1)
                if cand < best[i]:
                    best[i] = cand
                    back[i] = j
    # walk back, merging adjacent unknown single chars
    cuts = []
    i = n
    while i > 0:
        cuts.append((back[i], i))
        i = back[i]
    cuts.reverse()
    out: List[str] = []
    for j, i in cuts:
        tok = run[j:i]
        if tok not in _TH_WORDS and out and out[-1] not in _TH_WORDS:
            out[-1] += tok
        else:
            out.append(tok)
    return tuple(out)


def thai_tokenize(text: str) -> List[str]:
    """ThaiTokenizer analog: UAX#29 spans; Thai (SEA) spans segmented
    by the dictionary DP, everything else passes through."""
    from lucene_spark.analysis.uax29 import uax29_tokenize_spans

    out: List[str] = []
    for tok, _s, _e, kind in uax29_tokenize_spans(text):
        if kind == "sea" or (tok and _is_thai(tok[0])):
            out.extend(thai_segment(tok))
        else:
            out.append(tok)
    return out


def thai_analyze(text: str) -> List[Tuple[str, int]]:
    """ThaiAnalyzer analog: tokenize → lowercase → Thai stopwords,
    positions counted pre-stop (StopFilter increments)."""
    out: List[Tuple[str, int]] = []
    for pos, tok in enumerate(thai_tokenize(text)):
        t = tok.lower()
        if t not in THAI_STOP:
            out.append((t, pos))
    return out


def thai_tokens_udf(mode: str = "tokenize"):
    """Arrow-batched UDF: string → array<string> of tokens (mode
    'tokenize') or post-stop terms (mode 'analyze')."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, StringType

    fn = (
        (lambda s: list(thai_tokenize(s)))
        if mode == "tokenize"
        else (lambda s: [t for t, _ in thai_analyze(s)])
    )

    @F.pandas_udf(ArrayType(StringType()))
    def _seg(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ser in it:
            yield ser.map(lambda s: fn(s) if isinstance(s, str) else [])

    return _seg
