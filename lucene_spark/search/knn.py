"""Filtered KNN as a query-tree citizen.

`search/KnnFloatVectorQuery.java:60-104`: a vector top-k restricted to
docs matching an arbitrary filter query — the common production shape
("nearest products that are in stock"). Lucene pre-filters: the filter
is evaluated first and the vector search only visits matching docs
(falling back to exact search over the filtered set when the filter is
selective). The Spark re-expression does exactly that:

1. the filter's match set comes from the inverted index (unscored
   constant-score path, same machinery as FILTER clauses), minus
   tombstones;
2. a semi-join restricts the embedding table to matching ids — with
   embeddings bucketed/partitioned by id, this prunes the scan;
3. exact cosine top-k over the survivors (JVM-side `zip_with` /
   `aggregate`, `TakeOrderedAndProject` — no Python, no global sort).

For unfiltered ANN at scale use the IVF / LSH paths in
:mod:`lucene_spark.pipeline.similarity`; this module is the
*query-composable* exact variant.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import InvertedIndex
from lucene_spark.pipeline.similarity import _cosine_col, _cosine_col_safe
from lucene_spark.search.query import Query, rewrite

__all__ = [
    "knn_filtered_topk",
    "vector_similarity_match",
    "diversifying_children_topk",
]


def _unit_cosine_score(vec_col, qvec) -> "F.Column":
    """Lucene's COSINE similarity *score*: ``(1 + cosine) / 2``
    (`index/VectorSimilarityFunction.java:72-77`,
    normalizeToUnitInterval). Zero-norm vectors score 0: the safe
    cosine yields NULL there (ANSI divide-by-zero guard) and NULL / NaN
    would otherwise rank FIRST in a DESC sort."""
    raw = F.coalesce(_cosine_col_safe(vec_col, qvec), F.lit(-1.0))
    return (F.lit(1.0) + raw) / F.lit(2.0)


def vector_similarity_match(
    embeddings: DataFrame,
    qvec: Sequence[float],
    result_similarity: float,
    boost: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FloatVectorSimilarityQuery
    (`search/AbstractVectorSimilarityQuery.java:54,107-110`): every
    vector whose similarity SCORE (unit-scaled, not raw cosine) is
    ``>= resultSimilarity``, scored ``boost * score`` — a radius
    query, not a top-k. The reference's ``traversalSimilarity`` only
    bounds HNSW graph exploration; the exact (non-approximate) result
    set is defined by ``resultSimilarity`` alone, which is what this
    exact scan computes.

    Scale: one scan + codegen filter, no shuffle; with an LSH/IVF
    signature table the scan is replaced by bucket candidates exactly
    as in :func:`lucene_spark.pipeline.similarity.lsh_bucket_topk`.
    Returns (id, score) filtered, score desc / id asc."""
    s = _unit_cosine_score(F.col(vec_col), qvec)
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), s.alias("_s"))
        .filter(F.col("_s") >= F.lit(float(result_similarity)))
        .select(
            "vec_id",
            F.round(F.col("_s") * F.lit(float(boost)), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
    )


def diversifying_children_topk(
    children: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    parent_col: str = "parent_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DiversifyingChildrenFloatKnnVectorQuery
    (`join/DiversifyingChildrenFloatKnnVectorQuery.java:56,137-141`):
    KNN over child vectors where each parent contributes at most its
    single best-scoring child; the top-k *diverse* children (one per
    parent) come back with their parent ids.

    Spark shape: score children (codegen), drop the vector column,
    then a per-parent argmax via max_by — one partial-agg'd groupBy on
    the parent key (the window-over-payload trap is avoided: only
    (parent, id, score) reach the shuffle). Ties inside a parent break
    toward the smaller child id, global order score desc / parent asc.
    """
    s = _unit_cosine_score(F.col(vec_col), qvec)
    scored = children.select(
        F.col(parent_col).alias("parent_id"),
        F.col(id_col).alias("vec_id"),
        F.round(s, 6).alias("_s"),
    )
    best = scored.groupBy("parent_id").agg(
        F.max_by(
            F.col("vec_id"), F.struct(F.col("_s"), -F.col("vec_id"))
        ).alias("vec_id"),
        F.max("_s").alias("score"),
    )
    return (
        best.orderBy(F.col("score").desc(), F.col("parent_id").asc())
        .limit(k)
        .select("parent_id", "vec_id", "score")
    )


def knn_filtered_topk(
    index: InvertedIndex,
    embeddings: DataFrame,
    qvec: Sequence[float],
    filter_query: Query,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k (id, cos) among docs matching `filter_query`, cosine desc,
    id asc. The embedding id space is the docID space (vector field on
    the same documents)."""
    from lucene_spark.search.searcher import IndexSearcher

    searcher = IndexSearcher(index)
    q = rewrite(filter_query, index.terms)
    ctx = searcher._bind(q)
    docs = searcher._live(searcher._matching_docs(q, ctx).distinct())
    cand = embeddings.join(
        docs.withColumnRenamed("doc_id", id_col).select(id_col), id_col, "semi"
    )
    return (
        cand.select(
            F.col(id_col).alias("vec_id"),
            _cosine_col(F.col("embedding"), qvec).alias("_raw"),
        )
        .orderBy(F.col("_raw").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round("_raw", 6).alias("cos"))
    )
