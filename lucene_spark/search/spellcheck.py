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
