"""Byte-pair-encoding vocabulary training + encoding over a corpus.

Beyond-reference training-data-pipeline op (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
algorithm behind GPT-2/RoBERTa tokenizers).

Scale shape
-----------
BPE training consumes the corpus only through its WORD HISTOGRAM, so
the distributed work is exactly one partial-agg'd word count over the
corpus (map-side combine absorbs Zipf skew; the corpus never
reshuffles).  The merge loop itself runs driver-side over that
histogram — the same structure as the reference implementations
(subword-nmt, HuggingFace trainers), because each merge step mutates
global pair counts and is inherently sequential.  The histogram is
bounded to ``max_words`` rows by count-desc rank (ties broken by word
asc for determinism); the dropped tail's mass fraction is reported in
the result so truncation is never silent.

Encoding is an Arrow-batched pandas UDF memoized per unique word —
per-batch Python, embarrassingly parallel, no shuffle.

Determinism: merge selection breaks pair-count ties by pair
lexicographic order; word-rank ties by word order — identical merges
at any partitioning.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["train_bpe", "bpe_encode", "bpe_encode_udf", "END_OF_WORD"]

# marks the word-final symbol so "est</w>" (suffix) and "est" (infix)
# learn separate merges, as in Sennrich et al. §3.2
END_OF_WORD = "</w>"


def _word_counts(
    corpus: DataFrame, text_col: str, lowercase: bool, max_words: int
) -> Tuple[List[Tuple[str, int]], float]:
    tok = corpus.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
        ).alias("word")
    )
    if lowercase:
        tok = tok.select(F.lower("word").alias("word"))
    counts = tok.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n")).collect()[0][0] or 0
    top = counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(
        max_words
    ).collect()
    kept = sum(r["n"] for r in top)
    coverage = kept / total if total else 1.0
    return [(r["word"], int(r["n"])) for r in top], coverage


def _merge_loop(
    vocab: List[Tuple[Tuple[str, ...], int]], num_merges: int
) -> List[Tuple[str, str]]:
    """Sequential merge selection over the symbolized word histogram."""
    merges: List[Tuple[str, str]] = []
    words = [list(w) for w, _ in vocab]
    counts = [n for _, n in vocab]
    for _ in range(num_merges):
        pairs: Dict[Tuple[str, str], int] = {}
        for syms, n in zip(words, counts):
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # deterministic: count desc, then pair lexicographic asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def train_bpe(
    corpus: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    lowercase: bool = True,
    max_words: int = 1_000_000,
) -> dict:
    """Train BPE merges; returns {merges, vocab, coverage}.

    ``coverage`` is the kept histogram's token-mass fraction (1.0
    unless ``max_words`` truncated the tail).
    """
    wc, coverage = _word_counts(corpus, text_col, lowercase, max_words)
    vocab = [(tuple(w) + (END_OF_WORD,), n) for w, n in wc]
    merges = _merge_loop(vocab, num_merges)
    symbols = sorted(
        {c for w, _ in wc for c in w} | {END_OF_WORD} | {a + b for a, b in merges}
    )
    return {"merges": merges, "vocab": symbols, "coverage": coverage}


def bpe_encode(word: str, merges: List[Tuple[str, str]]) -> List[str]:
    """Encode one word with a trained merge list (rank-greedy: always
    apply the earliest-learned applicable merge, the standard
    decoder-compatible order)."""
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_udf(merges: List[Tuple[str, str]], lowercase: bool = True):
    """text → array<string> of BPE pieces (Arrow-batched, memoized per
    unique word within the batch)."""
    from pyspark.sql.functions import pandas_udf

    frozen = [tuple(m) for m in merges]

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        cache: Dict[str, List[str]] = {}

        def enc_text(t: Optional[str]) -> List[str]:
            out: List[str] = []
            for w in (t or "").split():
                if lowercase:
                    w = w.lower()
                got = cache.get(w)
                if got is None:
                    got = cache[w] = bpe_encode(w, frozen)
                out.extend(got)
            return out

        return s.map(enc_text)

    return _enc
