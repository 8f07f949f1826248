from lucene_spark.index.builder import BLOCKS_SCHEMA, InvertedIndex, assign_doc_ids

__all__ = ["BLOCKS_SCHEMA", "InvertedIndex", "assign_doc_ids"]
