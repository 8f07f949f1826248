"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprinting. All pure Spark SQL expressions (JVM-side,
whole-stage codegen) so each has a bit-identical DuckDB oracle; the
rolling-hash fingerprint additionally ships a vectorized numpy variant.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from lucene_spark.analysis import ENGLISH_STOP_WORDS

__all__ = [
    "language_id",
    "quality_score",
    "token_counts",
    "fingerprint_md5",
    "rolling_fingerprint",
]

_EN_MARKERS = sorted(ENGLISH_STOP_WORDS)


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic n-gram/script language guess (deterministic, SQL-only).

    Script check first (CJK → zh, Hangul → ko, Kana → ja), then an
    English-stopword-ratio threshold, else 'unk'. This is the
    *plumbing* for langid at scale — a real model slots into the same
    shape (column in, column out, no shuffle).
    """
    toks = F.split(F.col(text_col), " ")
    n_toks = F.size(F.filter(toks, lambda t: t != ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(list(_EN_MARKERS))))
    guess = (
        F.when(F.col(text_col).rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
        .when(F.col(text_col).rlike("[\\uac00-\\ud7af]"), F.lit("ko"))
        .when(F.col(text_col).rlike("[\\u3040-\\u30ff]"), F.lit("ja"))
        .when((n_toks > 0) & (stop_hits / n_toks >= 0.08), F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    return df.select(F.col(id_col).alias("doc_id"), guess.alias("lang_guess"))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality score from cheap surface statistics.

    Components (all per C4/Gopher-style heuristics): token count in a
    sane band, mean token length band, stopword ratio, distinct-token
    ratio. Score in [0,1], rounded to 6 places for oracle comparison.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(toks)
    n_d = n.cast("double")
    mean_len = F.when(n > 0, F.length(F.col(text_col)).cast("double") / n_d).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n > 0, F.size(F.filter(toks, lambda t: t.isin(list(_EN_MARKERS)))) / n_d
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n_d).otherwise(F.lit(0.0))
    score = (
        F.when((n >= 10) & (n <= 5000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_len >= 3.0) & (mean_len <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(0.25)).otherwise(F.lit(0.0))
        + distinct_ratio * F.lit(0.25)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword-piece count.

    The subword proxy counts runs of word chars plus standalone
    punctuation (a cheap stand-in for a real tokenizer's piece count;
    same regex in the DuckDB oracle).
    """
    ws = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    pieces = F.size(
        F.filter(
            F.split(F.col(text_col), "[^0-9A-Za-z]+"), lambda t: t != ""
        )
    )
    chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        pieces.alias("word_pieces"),
        chars.alias("n_chars"),
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized content fingerprint: md5 of sorted distinct tokens.

    Invariant to token order — catches shuffled near-copies that exact
    dedup misses. SQL-only (array_sort + array_distinct + md5).
    """
    norm = F.array_join(
        F.array_sort(F.array_distinct(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))),
        " ",
    )
    return df.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fingerprint"))


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 8, mod: int = (1 << 31) - 1
) -> DataFrame:
    """Rolling polynomial (Rabin-Karp) hash fingerprint, numpy-vectorized.

    fp(doc) = min over sliding windows of the polynomial hash of
    `window` consecutive codepoints (winnowing-style minimum) — robust
    to local edits. Arrow-batched; the per-batch work is pure numpy.

    mod defaults to 2^31-1 so every intermediate (h*base + c < 2^40)
    fits uint64 exactly — the hash is the true mathematical Rabin-Karp
    value, reproducible bit-for-bit in SQL (see the DuckDB oracle).
    """
    base = np.uint64(257)
    m = np.uint64(mod)

    @F.pandas_udf(T.LongType())
    def _fp(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pw = np.uint64(1)
        for _ in range(window - 1):
            pw = (pw * base) % m
        for s in it:
            out = np.zeros(len(s), dtype=np.int64)
            for i, t in enumerate(s):
                if not isinstance(t, str) or len(t) < window:
                    out[i] = 0
                    continue
                cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
                h = np.uint64(0)
                n = len(cps)
                hashes = np.empty(n - window + 1, dtype=np.uint64)
                for j in range(window):  # warm-up, O(window)
                    h = (h * base + cps[j]) % m
                hashes[0] = h
                # rolling update, vectorizable via prefix trick; loop is
                # per-codepoint numpy-scalar (acceptable: fingerprint is
                # not on the indexing hot path)
                for j in range(1, n - window + 1):
                    h = ((h + m - (cps[j - 1] * pw) % m) * base + cps[j + window - 1]) % m
                    hashes[j] = h
                out[i] = np.int64(hashes.min() & np.uint64(0x7FFFFFFFFFFFFFFF))
            yield pd.Series(out)

    return df.select(F.col(id_col).alias("doc_id"), _fp(F.col(text_col)).alias("rolling_fp"))


def c4_quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4's document-cleaning heuristics (Raffel et al. 2020 §2.2) as
    per-doc signals plus the resulting keep flag:

    - ``n_lines`` / ``short_line_frac`` — C4 drops lines with < 5
      words; the fraction tells how much of the doc that rule eats.
    - ``terminal_punct_line_frac`` — lines ending in ``. ! ? "``
      (C4 keeps only such lines).
    - ``n_sentences`` — terminal-punctuation runs; docs with < 3
      sentences are dropped.
    - ``has_lorem`` / ``has_brace`` — the "lorem ipsum" and ``{``
      (code) document kills.
    - ``keep`` — the composed C4 document rule.

    Every signal is a codegen'd expression over one scan (split +
    higher-order array functions + regexp_count): no UDF, no shuffle
    — the filter runs at scan speed in front of dedup at 100 TB.
    """
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda ln: ln != "")
    n_lines = F.size(lines)
    words_of = lambda ln: F.size(F.filter(F.split(ln, " "), lambda t: t != ""))  # noqa: E731
    short = F.size(F.filter(lines, lambda ln: words_of(ln) < 5))
    punct = F.size(F.filter(lines, lambda ln: ln.rlike('[.!?"]$')))
    n_sent = F.regexp_count(F.col(text_col), F.lit("[.!?]+"))
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    nl_d = n_lines.cast("double")
    keep = (n_sent >= 3) & ~has_lorem & ~has_brace
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        F.round(F.when(n_lines > 0, short / nl_d).otherwise(F.lit(0.0)), 4).alias(
            "short_line_frac"
        ),
        F.round(F.when(n_lines > 0, punct / nl_d).otherwise(F.lit(0.0)), 4).alias(
            "terminal_punct_line_frac"
        ),
        n_sent.cast("long").alias("n_sentences"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
        keep.cast("int").alias("keep"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Deflate compression-ratio quality signal (MassiveText/Gopher-
    family heuristic; Rae et al. 2021 use repetition fractions, the
    deflate ratio is the standard cheap proxy): compressed bytes / raw
    utf-8 bytes.  Very LOW ratios flag templated/repetitive machine
    text; very high ratios flag high-entropy noise (base64, minified
    blobs).  One Arrow pass, embarrassingly parallel, no shuffle —
    zlib is stdlib, so the 100 TB plan is pure map tasks.

    Returns (id_col, raw_bytes, compressed_bytes, ratio).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    def _one(s):
        import zlib

        raws, comps = [], []
        for t in s:
            b = t.encode("utf-8") if isinstance(t, str) else b""
            raws.append(len(b))
            comps.append(len(zlib.compress(b, level)) if b else 0)
        return pd.DataFrame({"raw_bytes": raws, "compressed_bytes": comps})

    _one.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    one = F.pandas_udf(_one, "struct<raw_bytes:long,compressed_bytes:long>")
    d = df.select(id_col, one(F.col(text_col)).alias("z"))
    return d.select(
        id_col,
        F.col("z.raw_bytes").alias("raw_bytes"),
        F.col("z.compressed_bytes").alias("compressed_bytes"),
        F.round(
            F.col("z.compressed_bytes")
            / F.greatest(F.col("z.raw_bytes"), F.lit(1)),
            4,
        ).alias("ratio"),
    )
