"""Suggesters over the term dictionary.

- :func:`prefix_suggest` — AnalyzingSuggester's core contract
  (`suggest/src/java/org/apache/lucene/search/suggest/analyzing/AnalyzingSuggester.java`):
  completions sharing the typed prefix, best weight first. Lucene
  walks a weighted FST; the terms table with a prefix predicate +
  `TakeOrderedAndProject` is the distributed equivalent (the prefix
  predicate hits parquet min/max pruning on the term-sorted table,
  playing the FST-arc role).
- :func:`infix_suggest` — AnalyzingInfixSuggester
  (`analyzing/AnalyzingInfixSuggester.java:94-120`): matches the
  fragment ANYWHERE in the suggestion (it indexes edge-grams of every
  token); weight-ordered. Re-expressed as a contains predicate; the
  scale path indexes the suggestions' edge n-grams
  (:func:`lucene_spark.analysis.filters.edge_ngrams`) so lookup is an
  equi-join on the gram instead of a substring scan.

Weights default to document frequency (the "popularity" weight the
suggest module's LineFileDocs examples use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex

__all__ = ["prefix_suggest", "infix_suggest"]


def prefix_suggest(index: InvertedIndex, prefix: str, n: int = 10) -> DataFrame:
    """(term, weight) completions of `prefix`, weight desc / term asc."""
    return (
        index.terms.filter(F.col("term").startswith(prefix))
        .select("term", F.col("doc_freq").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(n)
    )


def infix_suggest(index: InvertedIndex, fragment: str, n: int = 10) -> DataFrame:
    """(term, weight) suggestions containing `fragment` anywhere,
    weight desc / term asc (AnalyzingInfixSuggester.lookup)."""
    return (
        index.terms.filter(F.col("term").contains(fragment))
        .select("term", F.col("doc_freq").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("term").asc())
        .limit(n)
    )
