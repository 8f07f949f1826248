from lucene_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    analyze,
    extract_text_col,
    simple_lowercase,
    standard_analyzer_udf,
    term_freq_udf,
    term_freqs,
    tokenize,
    tokens_simple_col,
)

__all__ = [
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
    "analyze",
    "extract_text_col",
    "simple_lowercase",
    "standard_analyzer_udf",
    "term_freq_udf",
    "term_freqs",
    "tokenize",
    "tokens_simple_col",
]
