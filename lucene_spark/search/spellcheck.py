"""Spell correction from the term dictionary (DirectSpellChecker).

`lucene/suggest/src/java/org/apache/lucene/search/spell/DirectSpellChecker.java:40-77`:
candidate corrections come straight from the index's term dictionary
(no side index), ranked by edit distance then by docFreq, with a
docFreq floor so typos never "correct" to rarer typos. Lucene walks an
FST with a Levenshtein automaton; the Spark shape is a filter over the
terms table — vocabulary-sized, Catalyst-planned, with the same
length-window pre-filter the FuzzyQuery rewrite uses.

Distance is Damerau-Levenshtein (transpositions = 1 edit), matching
FuzzyQuery's default and the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.functions.editdist import damerau_within_udf
from lucene_spark.index.builder import InvertedIndex

__all__ = ["suggest_corrections"]


def suggest_corrections(
    index: InvertedIndex,
    term: str,
    max_edits: int = 2,
    num_suggestions: int = 5,
    min_doc_freq: int = 1,
) -> DataFrame:
    """Top corrections for `term`: (suggestion, doc_freq, distance),
    ordered distance asc, doc_freq desc, suggestion asc.

    The input term itself is excluded (a correctly-spelled word's best
    "correction" is itself — callers check existence first, as
    DirectSpellChecker's maxQueryFrequency does).
    """
    t = F.lit(term)
    window = (F.length("term") >= F.length(t) - max_edits) & (
        F.length("term") <= F.length(t) + max_edits
    )
    cand = index.terms.filter(
        window
        & (F.col("term") != term)
        & (F.col("doc_freq") >= min_doc_freq)
        & damerau_within_udf(term, max_edits)(F.col("term"))
    )
    # exact distance for ranking: re-run per candidate (vocabulary-tiny)
    from lucene_spark.functions.editdist import damerau_levenshtein

    @F.pandas_udf("int")
    def dist_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: damerau_levenshtein(x, term))

    return (
        cand.select(
            F.col("term").alias("suggestion"),
            "doc_freq",
            dist_udf(F.col("term")).alias("distance"),
        )
        .orderBy(
            F.col("distance").asc(), F.col("doc_freq").desc(), F.col("suggestion").asc()
        )
        .limit(num_suggestions)
    )


def _gram_sizes(word_len: int):
    """SpellChecker.getMin/getMax (java): len>5 → 3..4, len==5 → 2..3,
    shorter → 1..min(len,2)."""
    if word_len > 5:
        return 3, 4
    if word_len == 5:
        return 2, 3
    return 1, min(word_len, 2)


def spell_checker_suggest(
    dictionary: DataFrame,
    word: str,
    num_sug: int = 5,
    accuracy: float = 0.5,
    distance: str = "levenshtein",
    b_start: float = 2.0,
    b_end: float = 1.0,
    term_col: str = "term",
    freq_col: str = None,
    suggest_mode: str = "always",
):
    """Classic n-gram SpellChecker analog (`suggest/spell/
    SpellChecker.java:66`): candidates retrieved by shared n-grams of
    the reference's per-length sizes with the start-gram (2.0) and
    end-gram (1.0) boosts, top ``10·numSug`` kept (maxHits), then
    RE-RANKED by StringDistance (LevenshteinDistance default) with the
    ``accuracy`` floor (0.5 default) and the word-itself skip;
    SuggestWordScoreComparator order (distance desc, freq desc, term
    asc).  Documented divergence: retrieval scores are boosted
    shared-gram counts rather than BM25 over a side index — the
    candidate set has the same shape and the user-visible ranking is
    the re-ranked one either way.

    ``dictionary``: any (term[, freq]) frame — ``index.terms``, a
    HighFrequencyDictionary, or a FileDictionary.

    ``suggest_mode`` (`spell/SuggestMode.java`, requires ``freq_col``
    for the frequency-aware modes):
    ``always`` | ``when_not_in_index`` (no suggestions when the word
    itself is a dictionary term with freq > 0) | ``more_popular``
    (only candidates strictly more frequent than the word).
    """
    from .stringdist import string_distance_udf

    if suggest_mode not in ("always", "when_not_in_index", "more_popular"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    goal_freq = 0
    if suggest_mode != "always":
        if freq_col is None:
            raise ValueError("frequency-aware suggest modes need freq_col")
        row = (
            dictionary.filter(F.col(term_col) == word)
            .select(freq_col)
            .collect()
        )
        goal_freq = int(row[0][0]) if row else 0
        if suggest_mode == "when_not_in_index" and goal_freq > 0:
            return dictionary.sparkSession.createDataFrame(
                [], f"{term_col} string, sim double, freq long"
            )

    lo, hi = _gram_sizes(len(word))
    score = F.lit(0.0)
    for ng in range(lo, hi + 1):
        grams = [word[i : i + ng] for i in range(len(word) - ng + 1)]
        if not grams:
            continue
        if b_start > 0:
            score = score + F.when(
                F.col(term_col).startswith(grams[0]), F.lit(float(b_start))
            ).otherwise(0.0)
        if b_end > 0:
            score = score + F.when(
                F.col(term_col).endswith(grams[-1]), F.lit(float(b_end))
            ).otherwise(0.0)
        for g in grams:  # duplicates intentionally count twice (java)
            score = score + F.when(
                F.instr(F.col(term_col), g) > 0, F.lit(1.0)
            ).otherwise(0.0)
    cand = (
        dictionary.withColumn("_g", score)
        .filter(F.col("_g") > 0)
        .orderBy(F.col("_g").desc(), F.col(term_col).asc())
        .limit(10 * num_sug)
    )
    dist = string_distance_udf(distance)(F.lit(word), F.col(term_col))
    freq = F.col(freq_col) if freq_col else F.lit(0).cast("long")
    out = (
        cand.withColumn("sim", F.round(dist, 6))
        .filter((F.col(term_col) != word) & (F.col("sim") >= accuracy))
        .select(term_col, "sim", freq.alias("freq"))
    )
    if suggest_mode == "more_popular":
        out = out.filter(F.col("freq") > goal_freq)
    return (
        out.orderBy(
            F.col("sim").desc(), F.col("freq").desc(), F.col(term_col).asc()
        ).limit(num_sug)
    )
