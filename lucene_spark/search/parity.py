"""SQL-parity BM25 retrieval: engine structure, float64 oracle-matching math.

The driver's correctness gate compares each Spark query against an
ANSI-SQL DuckDB oracle by value hash. Lucene's float32 scoring cannot
be reproduced bit-exactly in ANSI SQL, so gate queries run the *same
engine machinery* (analyzer → posting blocks → decode → stats) but
score in float64 with a formula that plain SQL reproduces exactly:

    dl_q   = byte4ToInt(intToByte4(dl))          -- the lossy norm round-trip
    idf    = ln(1 + (N - df + 0.5) / (df + 0.5))
    norm_f = k1 * (1 - b + b * dl_q / (sttf / N))
    score  = Σ_terms boost * idf * freq / (freq + norm_f), rounded to 4dp

(`freq/(freq+norm)` is Lucene's score before the monotonicity rewrite —
algebraically identical, and in float64 the 1e-16 evaluation-order
noise is absorbed by the rounding.) The float32-exact path
(`IndexSearcher`) is verified separately by pytest goldens and the
naive-reference differential tests.

:func:`oracle_bm25_sql` emits the matching DuckDB SQL so the Spark and
oracle sides are generated from one parameter set and cannot drift.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, functions as F

from lucene_spark.functions.smallfloat import byte4_to_int
from lucene_spark.index.builder import InvertedIndex
from lucene_spark.search.searcher import IndexSearcher, _decode_score_udf  # noqa: F401

import numpy as np
import pandas as pd
from pyspark.sql import types as T

__all__ = ["bm25_topk_f64", "oracle_bm25_sql"]

K1, B = 1.2, 0.75

_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("freq", T.IntegerType(), False),
        T.StructField("norm", T.IntegerType(), False),
    ]
)


def _decode_postings(index: InvertedIndex, terms: list) -> DataFrame:
    """Decode (doc_id, term, freq, norm byte) for the given terms."""
    from lucene_spark.functions.forutil import delta_decode, for_decode, pfor_decode

    def fn(batches):
        for pdf in batches:
            outs = []
            for term, docs_b, freqs_b, norms_b in zip(
                pdf["term"].values,
                pdf["docs_packed"].values,
                pdf["freqs_packed"].values,
                pdf["norms_raw"].values,
            ):
                docs = delta_decode(for_decode(bytes(docs_b)))
                freqs = pfor_decode(bytes(freqs_b)).astype(np.int32)
                norms = np.frombuffer(bytes(norms_b), dtype=np.uint8).astype(np.int32)
                outs.append(
                    pd.DataFrame(
                        {"doc_id": docs, "term": term, "freq": freqs, "norm": norms}
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return (
        index.blocks.filter(F.col("term").isin(terms))
        .select("term", "docs_packed", "freqs_packed", "norms_raw")
        .mapInPandas(fn, _POSTINGS_SCHEMA)
    )


def bm25_topk_f64(
    index: InvertedIndex,
    term_boosts: Dict[str, float],
    k: int = 10,
    min_should_match: int = 0,
    must_terms: Optional[list] = None,
    must_not_terms: Optional[list] = None,
    filter_terms: Optional[list] = None,
) -> DataFrame:
    """Engine-backed BM25 boolean top-k with SQL-reproducible scores.

    Returns (doc_id long, score double rounded 4dp), ordered
    score desc / doc_id asc, limited to k.
    """
    spark = index.spark
    all_terms = sorted(
        set(term_boosts) | set(must_terms or []) | set(must_not_terms or []) | set(filter_terms or [])
    )
    posts = _decode_postings(index, all_terms)

    # 256-row broadcast: norm byte → quantized decoded length
    dlq = spark.createDataFrame(
        [(int(i), int(byte4_to_int(np.int64(i)))) for i in range(256)],
        "norm int, dl_q int",
    )
    # per-term stats (exact ints from the index) + boosts
    stats = {
        r["term"]: int(r["doc_freq"])
        for r in index.terms.filter(F.col("term").isin(all_terms)).collect()
    }
    scored_terms = [t for t in term_boosts if t in stats]
    n, sttf = index.doc_count, index.sum_total_term_freq
    tb = spark.createDataFrame(
        [(t, float(term_boosts[t]), stats[t]) for t in scored_terms]
        or [("", 0.0, 0)],
        "term string, boost double, doc_freq long",
    )
    avgdl = F.lit(float(sttf)) / F.lit(float(n))
    idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("doc_freq") + F.lit(0.5)) / (F.col("doc_freq") + F.lit(0.5)))
    norm_f = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl_q") / avgdl)
    per_term = F.col("boost") * idf * F.col("freq") / (F.col("freq") + norm_f)

    scored = (
        posts.filter(F.col("term").isin(scored_terms) if scored_terms else F.lit(False))
        .join(F.broadcast(dlq), "norm")
        .join(F.broadcast(tb), "term")
        .withColumn("s", per_term)
        .groupBy("doc_id")
        .agg(F.sum("s").alias("s"), F.count(F.lit(1)).alias("nmatch"))
    )
    if min_should_match > 0:
        scored = scored.filter(F.col("nmatch") >= min_should_match)
    for t in must_terms or []:
        scored = scored.join(
            posts.filter(F.col("term") == t).select("doc_id").distinct(), "doc_id", "semi"
        )
    for t in filter_terms or []:
        scored = scored.join(
            posts.filter(F.col("term") == t).select("doc_id").distinct(), "doc_id", "semi"
        )
    for t in must_not_terms or []:
        scored = scored.join(
            posts.filter(F.col("term") == t).select("doc_id").distinct(), "doc_id", "left_anti"
        )
    # order by the raw double (matching the oracle's ORDER BY s), round after
    return (
        scored.orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", F.round(F.col("s"), 4).alias("score"))
    )


# --- DuckDB oracle generation ----------------------------------------------

_DLQ_SQL = """
  CASE WHEN dl < 24 THEN dl
       WHEN (dl - 24) < 8 THEN dl
       ELSE 24 + ((dl - 24) >> (length(bin(dl - 24)) - 4)) * (1 << (length(bin(dl - 24)) - 4))
  END
"""


def oracle_bm25_sql(
    term_boosts: Dict[str, float],
    k: int = 10,
    min_should_match: int = 0,
    must_terms: Optional[list] = None,
    must_not_terms: Optional[list] = None,
    filter_terms: Optional[list] = None,
    table: str = "documents",
) -> str:
    """DuckDB SQL mirroring :func:`bm25_topk_f64` on the same table."""
    terms_in = ", ".join(f"'{t}'" for t in term_boosts)
    boost_rows = ", ".join(f"('{t}', {b!r})" for t, b in term_boosts.items())
    req = list(must_terms or []) + list(filter_terms or [])
    req_clauses = "".join(
        f"\n  AND doc_id IN (SELECT doc_id FROM tok WHERE term = '{t}')" for t in req
    )
    not_clauses = "".join(
        f"\n  AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = '{t}')"
        for t in (must_not_terms or [])
    )
    msm = f"\n  AND nmatch >= {min_should_match}" if min_should_match > 0 else ""
    return f"""
WITH tok AS (
  -- mirror the engine's simple analyzer: split on ' ', drop empties
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
  ) WHERE term <> ''
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS sttf FROM dl),
dlq AS (SELECT doc_id, {_DLQ_SQL} AS dl_q FROM dl),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok
  WHERE term IN ({terms_in}) GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
boosts(term, boost) AS (VALUES {boost_rows}),
scores AS (
  SELECT tf.doc_id,
         sum(boost * ln(1 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))
             * freq / (freq + {K1} * (1 - {B} + {B} * dl_q / (sttf * 1.0 / n_docs)))) AS s,
         count(*) AS nmatch
  FROM tf
  JOIN df USING (term) JOIN boosts USING (term) JOIN dlq USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scores
WHERE 1=1{msm}{req_clauses}{not_clauses}
ORDER BY s DESC, doc_id ASC LIMIT {k}
"""
