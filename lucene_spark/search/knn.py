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
from lucene_spark.pipeline.similarity import _cosine_col
from lucene_spark.search.query import Query, rewrite

__all__ = ["knn_filtered_topk"]


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
