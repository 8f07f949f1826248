from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiTermFilterDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SpanNearQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    TooManyClauses,
    WildcardQuery,
    get_max_clause_count,
    rewrite,
    set_max_clause_count,
)
from lucene_spark.search.geo import (
    box_query,
    distance_query,
    geohash_cell,
    haversine_meters,
    nearest_k,
)
from lucene_spark.search.collapse import collapse_topk
from lucene_spark.search.covering import covering_matches
from lucene_spark.search.grouping import (
    all_group_heads,
    all_groups,
    block_grouping_topk,
    distinct_values_per_group,
    group_facet_counts,
    range_group_topk,
)
from lucene_spark.search.inet import (
    inet_prefix_query,
    inet_range_query,
    inet_set_query,
    int128_range_query,
)
from lucene_spark.search.matches import named_matches, term_match_positions

from lucene_spark.search.querycache import LRUQueryCache
from lucene_spark.search.facets import (
    drill_down,
    dynamic_range_facets,
    taxonomy_children,
)
from lucene_spark.search.misc import (
    diversified_topk,
    doc_values_stats,
    high_freq_terms,
)
from lucene_spark.search.memoryindex import memory_index_scores
from lucene_spark.search.profiler import profile_df, profile_tree
from lucene_spark.search.highlight import best_passages
from lucene_spark.search.flexibleparser import StandardQueryParser
from lucene_spark.search.queryparser import QueryParseError, parse_query
from lucene_spark.search.simpleparser import simple_parse
from lucene_spark.search.surround import surround_parse
from lucene_spark.search.xmlparser import xml_parse
from lucene_spark.search.rescore import (
    feature_bm25_topk,
    log_feature,
    rescore_phrase_topk,
    saturation,
    sigmoid,
)
from lucene_spark.search.payloads import decode_payloads, payload_score_topk, payloads_for_query
from lucene_spark.search.timelimit import time_limited_topk
from lucene_spark.search.lifetime import ControlledReopenController, PruneByAge, SearcherLifetimeManager, SearcherManager
from lucene_spark.search.tostring import query_to_string
from lucene_spark.search.complexphrase import complex_phrase_docs, parse_complex_phrase
from lucene_spark.search.suggest import (
    build_freetext_model,
    freetext_suggest,
    infix_suggest,
    prefix_suggest,
)
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.positional import (
    decode_positions,
    dismax_topk,
    phrase_freqs,
    phrase_topk,
    synonym_topk,
)

__all__ = [
    "box_query",
    "distance_query",
    "geohash_cell",
    "haversine_meters",
    "nearest_k",
    "QueryParseError",
    "parse_query",
    "StandardQueryParser",
    "simple_parse",
    "surround_parse",
    "xml_parse",
    "SpanNearQuery",
    "collapse_topk",
    "covering_matches",
    "all_groups",
    "all_group_heads",
    "block_grouping_topk",
    "distinct_values_per_group",
    "group_facet_counts",
    "range_group_topk",
    "inet_prefix_query",
    "inet_range_query",
    "inet_set_query",
    "int128_range_query",
    "named_matches",
    "term_match_positions",
    "LRUQueryCache",
    "best_passages",
    "drill_down",
    "taxonomy_children",
    "feature_bm25_topk",
    "log_feature",
    "rescore_phrase_topk",
    "saturation",
    "sigmoid",
    "decode_payloads",
    "payloads_for_query",
    "time_limited_topk",
    "SearcherManager",
    "SearcherLifetimeManager",
    "PruneByAge",
    "ControlledReopenController",
    "query_to_string",
    "payload_score_topk",
    "complex_phrase_docs",
    "parse_complex_phrase",
    "build_freetext_model",
    "freetext_suggest",
    "infix_suggest",
    "prefix_suggest",
    "decode_positions",
    "dismax_topk",
    "phrase_freqs",
    "phrase_topk",
    "synonym_topk",
    "BooleanClause",
    "BooleanQuery",
    "BoostQuery",
    "ConstantScoreQuery",
    "DisjunctionMaxQuery",
    "FuzzyQuery",
    "IndexSearcher",
    "MatchAllDocsQuery",
    "MatchNoDocsQuery",
    "MultiTermFilterDocsQuery",
    "TooManyClauses",
    "get_max_clause_count",
    "set_max_clause_count",
    "Occur",
    "PhraseQuery",
    "PrefixQuery",
    "Query",
    "RegexpQuery",
    "TermInSetQuery",
    "TermQuery",
    "TermRangeQuery",
    "WildcardQuery",
    "rewrite",
    "dynamic_range_facets",
    "diversified_topk",
    "doc_values_stats",
    "high_freq_terms",
    "memory_index_scores",
    "profile_df",
    "profile_tree",
]
