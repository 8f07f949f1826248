"""FuzzyLikeThisQuery — fuzzify all source terms, keep the best n.

Reference: `lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java:55` — "mixes the behaviour of FuzzyQuery and
MoreLikeThis": every analyzed source term is expanded against the
term dictionary (FuzzyTermsEnum), each variant scored by

    sim      = 1 - edit_distance / min(len(variant), len(source))
               (`FuzzyTermsEnum.java:256` boost attribute)
    score    = sim^2 * idf(df_source)          (`FuzzyLikeThisQuery.java:246`)
    idf      = ln((N+1)/(df+1)) + 1            (ClassicSimilarity)

where df_source is the SOURCE term's docFreq (all variants share it so
rarer misspellings are not favoured — the class-level comment); when
the source term is absent from the index the average variant df
substitutes (`:240-244`). The top `max_variants_per_term` variants per
source term, then the global top `max_num_terms` across terms, become
a SHOULD disjunction whose per-variant boost is that score.

Final-match scoring mirrors `newTermQuery`'s artificial df=ttf=1
TermStates (`:258-274`): every variant scores with the SAME unit-df
ClassicSimilarity idf, so only boost, tf and doc length differentiate
docs — expressed here as an :class:`ExpressionSimilarity` over the
shared stats surface (`similarity_topk_f64`), one decode pass, no
Python in the scoring loop. ``ignore_tf=True`` is the reference's
ConstantScore mode: score = Σ boost over matching variants
(BooleanSimilarity).

Scale shape: expansion is a broadcast of the tiny source-term frame
against the distributed term dictionary (length-window + prefix
prefilters are codegen'd; the pairwise Damerau check is an
Arrow-batched pandas UDF over the survivors only), a window top-50
per source term, and one k-bounded collect of at most `max_num_terms`
rows — the dictionary never moves to the driver.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.functions.editdist import damerau_levenshtein
from lucene_spark.search.parity import similarity_topk_f64
from lucene_spark.search.similarity import (
    BooleanSimilarity,
    ExpressionSimilarity,
)

__all__ = [
    "fuzzy_like_this_variants",
    "fuzzy_like_this_topk",
    "oracle_fuzzy_like_this_sql",
]


def _damerau_pair():
    # built lazily: pandas_udf type resolution needs an active session
    @F.pandas_udf("int")
    def pair(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [damerau_levenshtein(x, y) for x, y in zip(a, b)], dtype="int32"
        )

    return pair


def fuzzy_like_this_variants(
    index,
    source_terms: Sequence[str],
    max_edits: int = 1,
    prefix_length: int = 0,
    max_variants_per_term: int = 50,
    max_num_terms: int = 25,
) -> List[Tuple[str, str, float]]:
    """(variant, source, score) rows — the rewrite()'s selected clause
    set, ordered score desc / variant asc. Ties rank smaller terms
    first (the reference PQ comparator evicts the larger term)."""
    if max_edits < 0 or max_edits > 2:
        raise ValueError("max_edits must be 0, 1 or 2 (LevenshteinAutomata cap)")
    spark = index.spark
    srcs = list(dict.fromkeys(source_terms))  # dedup, keep order (:208)
    if not srcs:
        return []
    src_df = spark.createDataFrame(
        [(s, len(s), s[:prefix_length]) for s in srcs],
        "src string, src_len int, src_prefix string",
    )
    dict_df = index.terms.select("term", "doc_freq")
    # codegen'd prefilters before the Python distance check
    win = (F.length("term") >= F.col("src_len") - max_edits) & (
        F.length("term") <= F.col("src_len") + max_edits
    )
    if prefix_length > 0:
        win = win & (
            F.substring("term", 1, prefix_length) == F.col("src_prefix")
        )
    cand = (
        dict_df.join(F.broadcast(src_df), win)
        .withColumn("ed", _damerau_pair()(F.col("term"), F.col("src")))
        .filter(F.col("ed") <= max_edits)
        .withColumn(
            "sim",
            F.lit(1.0)
            - F.col("ed") / F.least(F.length("term"), F.col("src_len")),
        )
    )
    # top max_variants_per_term per source by sim (FuzzyLikeThisQuery
    # variantsQ), then attach the shared source idf
    rn = F.row_number().over(
        Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("term").asc())
    )
    kept = cand.withColumn("_rn", rn).filter(F.col("_rn") <= max_variants_per_term)
    rows = kept.select("src", "term", "sim", "doc_freq").collect()
    if not rows:
        return []
    n_docs = index.doc_count
    by_src: Dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    # df_source = exact docFreq, else avg variant df (:240-244); the
    # per-source row sets are <= max_variants_per_term — driver math
    scored: List[Tuple[str, str, float]] = []
    for s, rs in by_src.items():
        exact = [r for r in rs if r["term"] == s]
        # integer truncation like the reference's int division (:240)
        df = (
            int(exact[0]["doc_freq"])
            if exact
            else sum(int(r["doc_freq"]) for r in rs) // len(rs)
        )
        idf = math.log((n_docs + 1.0) / (df + 1.0)) + 1.0
        for r in rs:
            s_v = float(r["sim"])
            scored.append((r["term"], s, s_v * s_v * idf))
    scored.sort(key=lambda x: (-x[2], x[0], x[1]))
    return scored[:max_num_terms]


def _unit_df_classic() -> ExpressionSimilarity:
    """ClassicSimilarity with the artificial df=1 TermStates of
    `FuzzyLikeThisQuery.newTermQuery` (:258-274): idf collapses to the
    same constant for every variant."""
    return ExpressionSimilarity(
        fn=lambda c: c["boost"]
        * (F.log((c["n_docs"] + F.lit(1.0)) / F.lit(2.0)) + F.lit(1.0))
        * F.sqrt(c["freq"])
        / F.sqrt(c["dl"]),
        sql=(
            "boost * (ln((n_docs + 1.0) / 2.0) + 1.0) "
            "* sqrt(freq) / sqrt(dl)"
        ),
    )


def fuzzy_like_this_topk(
    index,
    source_terms: Sequence[str],
    k: int = 10,
    max_edits: int = 1,
    prefix_length: int = 0,
    max_variants_per_term: int = 50,
    max_num_terms: int = 25,
    ignore_tf: bool = False,
    round_score: bool = True,
) -> DataFrame:
    """Top-k docs for the rewritten FuzzyLikeThis disjunction."""
    variants = fuzzy_like_this_variants(
        index,
        source_terms,
        max_edits,
        prefix_length,
        max_variants_per_term,
        max_num_terms,
    )
    boosts: Dict[str, float] = {}
    for term, _src, score in variants:
        # a variant selected under two source terms contributes one
        # SHOULD clause per source in the reference tree — additive
        boosts[term] = boosts.get(term, 0.0) + score
    sim = BooleanSimilarity() if ignore_tf else _unit_df_classic()
    return similarity_topk_f64(index, boosts, sim, k=k, round_score=round_score)


def oracle_fuzzy_like_this_sql(
    source_terms: Sequence[str],
    k: int = 10,
    max_edits: int = 1,
    prefix_length: int = 0,
    max_variants_per_term: int = 50,
    max_num_terms: int = 25,
    ignore_tf: bool = False,
    table: str = "documents",
    rounded: bool = True,
) -> str:
    """Full-pipeline DuckDB oracle: dictionary + df from the token
    stream, damerau_levenshtein expansion, per-source top-variants,
    source-df idf, global top-N, then the same unit-df scoring."""
    srcs = list(dict.fromkeys(source_terms))
    src_rows = ", ".join(
        f"('{s}', {len(s)}, '{s[:prefix_length]}')" for s in srcs
    )
    prefix_pred = (
        f"AND substr(term, 1, {prefix_length}) = src_prefix"
        if prefix_length > 0
        else ""
    )
    score_expr = (
        "boost"
        if ignore_tf
        else "boost * (ln((n_docs + 1.0) / 2.0) + 1.0) * sqrt(freq) / sqrt(dl)"
    )
    from lucene_spark.search.parity import _DLQ_SQL

    return f"""
WITH tok AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
  ) WHERE term <> ''
),
dict AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM tok GROUP BY term
),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tok),
srcs(src, src_len, src_prefix) AS (VALUES {src_rows}),
cand AS (
  SELECT d.term, s.src, d.doc_freq,
         damerau_levenshtein(d.term, s.src) AS ed,
         1.0 - damerau_levenshtein(d.term, s.src)
             / least(length(d.term), s.src_len) AS sim
  FROM dict d JOIN srcs s
    ON length(d.term) BETWEEN s.src_len - {max_edits}
                          AND s.src_len + {max_edits} {prefix_pred}
  WHERE damerau_levenshtein(d.term, s.src) <= {max_edits}
),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY src ORDER BY sim DESC, term ASC) AS rn
    FROM cand
  ) WHERE rn <= {max_variants_per_term}
),
srcdf AS (
  SELECT src,
         coalesce(max(CASE WHEN term = src THEN doc_freq END),
                  sum(doc_freq) // count(*)) AS df
  FROM kept GROUP BY src
),
scoredv AS (
  SELECT k.term, k.src,
         k.sim * k.sim * (ln((n_docs + 1.0) / (sd.df + 1.0)) + 1.0) AS vscore
  FROM kept k JOIN srcdf sd USING (src) CROSS JOIN nd
),
topv AS (
  SELECT term, src, vscore FROM scoredv
  ORDER BY vscore DESC, term ASC, src ASC LIMIT {max_num_terms}
),
boosts AS (SELECT term, sum(vscore) AS boost FROM topv GROUP BY term),
dl0 AS (SELECT doc_id, count(*) AS dl0 FROM tok GROUP BY doc_id),
dlq AS (SELECT doc_id,
               CAST({_DLQ_SQL.replace("dl", "dl0")} AS DOUBLE) AS dl FROM dl0),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS freq FROM tok
  WHERE term IN (SELECT term FROM boosts) GROUP BY doc_id, term
),
scores AS (
  SELECT tf.doc_id, sum({score_expr}) AS s
  FROM tf JOIN boosts USING (term) JOIN dlq USING (doc_id) CROSS JOIN nd
  GROUP BY tf.doc_id
)
SELECT doc_id, {"round(s, 4)" if rounded else "s"} AS score FROM scores
ORDER BY s DESC, doc_id ASC LIMIT {k}
"""
