"""lucene_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch re-expression of Apache Lucene's core indexing/search
pipeline (reference: bharath-techie/lucene @ 2025-09-12) on Spark
DataFrames:

- analysis chain (StandardTokenizer-equivalent + lowercase + stop) as
  Arrow-batched pandas UDFs (``lucene_spark.analysis``),
- per-partition segment posting-list build with delta+FOR/PFor
  compressed 128-doc blocks, skip metadata and block-max impacts
  (``lucene_spark.index``),
- tiered/log segment merging (``lucene_spark.index.merge``),
- BM25 (k1=1.2, b=0.75, Lucene norm quantization) top-k retrieval,
  exhaustive and block-max-WAND pruned (``lucene_spark.search``),
- training-data pipeline ops: dedup, similarity search, text stats
  (``lucene_spark.pipeline``).

Everything is DataFrame-first: joins/aggregations/top-k lower to stock
Catalyst operators; numpy kernels run inside Arrow-batched pandas UDFs
(never per-row Python).
"""

__version__ = "0.1.0"

from lucene_spark.index import InvertedIndex, assign_doc_ids, check_index  # noqa: E402
from lucene_spark.search import IndexSearcher, parse_query  # noqa: E402

__all__ = [
    "InvertedIndex",
    "IndexSearcher",
    "assign_doc_ids",
    "check_index",
    "parse_query",
    "__version__",
]
