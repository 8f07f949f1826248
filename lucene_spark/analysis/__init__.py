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
from lucene_spark.analysis.porter import (
    english_analyze,
    english_term_freqs,
    porter_stem,
    strip_possessive,
)

__all__ = [
    "english_analyze",
    "english_term_freqs",
    "porter_stem",
    "strip_possessive",
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
