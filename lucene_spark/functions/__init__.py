from lucene_spark.functions.smallfloat import (
    int_to_byte4,
    byte4_to_int,
    long_to_int4,
    int4_to_long,
    LENGTH_TABLE,
    NUM_FREE_VALUES,
)
from lucene_spark.functions.bm25 import BM25, bm25_idf, bm25_cache

__all__ = [
    "int_to_byte4",
    "byte4_to_int",
    "long_to_int4",
    "int4_to_long",
    "LENGTH_TABLE",
    "NUM_FREE_VALUES",
    "BM25",
    "bm25_idf",
    "bm25_cache",
]
