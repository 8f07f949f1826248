"""Repetition / boilerplate signals for LLM training-data curation.

The published web-corpus pipelines (Gopher's repetition filters —
Rae et al. 2021 §A1.1; C4's heuristics — Raffel et al. 2020 §2.2)
drop documents dominated by repeated lines or n-grams. This module
computes those per-document signals at corpus scale:

- ``dup_line_frac`` — duplicate line occurrences beyond the first,
  over total lines.
- ``dup_line_char_frac`` — characters inside those duplicate
  occurrences, over total line characters.
- ``top{n}_char_frac`` (n=2,3) — characters covered by the single
  most-covering word n-gram (count × n-gram length / doc chars).
  Deterministic variant of Gopher's "fraction of characters in the
  most common n-gram": we take the max of count×length directly, so
  count ties can't make the result depend on hash order.
- ``dup5_frac`` — 5-gram occurrences whose 5-gram occurs more than
  once, over total 5-gram occurrences (Gopher's duplicate n-gram
  family, occurrence-fraction form).

Every signal is computable from the document alone, so the engine is
ONE Arrow-batched ``mapInPandas`` pass — no explode, no shuffle, no
per-doc groupBy. That is the 100 TB shape: signals stream out at scan
speed and the only wide operation in a curation pipeline remains the
final dedup/join. (A pure-SQL explode+groupBy formulation of the same
signals costs a full shuffle keyed by (doc, ngram); at web scale that
shuffle is strictly wasted work because no cross-document state is
needed.) ``lines`` come from ``\\n`` when present; for flat
token-stream corpora pass ``line_tokens`` to chunk the token array
into fixed-width pseudo-lines so the line signals stay exercised.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["repetition_signals"]

def _r4(x: float) -> float:
    """4dp half-away-from-zero (values here are >= 0): matches DuckDB
    round() and Java Math.round; Python's round() is half-to-EVEN and
    diverges at .5 boundaries (e.g. 1/32 -> 0.0312 vs 0.0313)."""
    import math

    return math.floor(x * 10_000 + 0.5) / 10_000


_SCHEMA = (
    "doc_id long, n_words long, n_lines long, dup_line_frac double, "
    "dup_line_char_frac double, top2_char_frac double, "
    "top3_char_frac double, dup5_frac double"
)


def _doc_signals(text: str, line_tokens: int | None):
    words = [w for w in text.split(" ") if w]
    n_words = len(words)
    if line_tokens is not None:
        lines = [
            " ".join(words[i : i + line_tokens])
            for i in range(0, n_words, line_tokens)
        ]
    else:
        lines = [ln for ln in text.split("\n") if ln]
    n_lines = len(lines)
    lc = Counter(lines)
    total_line_chars = sum(len(ln) for ln in lines)
    dup_occ = sum(c - 1 for c in lc.values())
    dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
    dup_line_frac = dup_occ / n_lines if n_lines else 0.0
    dup_line_char_frac = dup_chars / total_line_chars if total_line_chars else 0.0

    n_chars = len(text)

    def top_frac(n: int) -> float:
        if n_words < n or n_chars == 0:
            return 0.0
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(n_words - n + 1)
        )
        return max(c * len(g) for g, c in grams.items()) / n_chars

    def dup_frac(n: int) -> float:
        if n_words < n:
            return 0.0
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(n_words - n + 1)
        )
        total = sum(grams.values())
        return sum(c for c in grams.values() if c > 1) / total

    return (
        n_words,
        n_lines,
        dup_line_frac,
        dup_line_char_frac,
        top_frac(2),
        top_frac(3),
        dup_frac(5),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_tokens: int | None = None,
) -> DataFrame:
    """Per-doc repetition signals (see module docstring), one
    shuffle-free Arrow pass. Fractions rounded to 4dp so the DuckDB
    oracle hash-matches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                sig = _doc_signals(text or "", line_tokens)
                rows.append(
                    (
                        doc_id,
                        sig[0],
                        sig[1],
                        _r4(sig[2]),
                        _r4(sig[3]),
                        _r4(sig[4]),
                        _r4(sig[5]),
                        _r4(sig[6]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_words",
                    "n_lines",
                    "dup_line_frac",
                    "dup_line_char_frac",
                    "top2_char_frac",
                    "top3_char_frac",
                    "dup5_frac",
                ],
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=_SCHEMA)
