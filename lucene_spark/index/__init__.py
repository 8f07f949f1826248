from lucene_spark.index.builder import (
    BLOCKS_SCHEMA,
    BLOCKS_SCHEMA_POS,
    InvertedIndex,
    assign_doc_ids,
)
from lucene_spark.index.check import check_index
from lucene_spark.index.resumable import load_resumable, resumable_build

__all__ = [
    "BLOCKS_SCHEMA",
    "BLOCKS_SCHEMA_POS",
    "InvertedIndex",
    "assign_doc_ids",
    "check_index",
    "load_resumable",
    "resumable_build",
]
