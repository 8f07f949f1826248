from lucene_spark.pipeline.dedup import (
    duplicate_clusters,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
    simhash_pairs_from_hashes,
    word_shingles,
)
from lucene_spark.pipeline.sampling import (
    hash_sample,
    pack_sequences,
    stratified_sample,
)
from lucene_spark.pipeline.chunking import sentence_windows
from lucene_spark.pipeline.textstats import compression_ratio
from lucene_spark.pipeline.urls import (
    domain_cap,
    canonicalize_url,
    registered_domain,
    url_host,
)
from lucene_spark.pipeline.similarity import (
    ivf_assign,
    ivf_topk,
    ivf_pq_topk,
    cosine_topk,
    embedding_near_dups,
    lsh_bucket_topk,
    lsh_signatures,
    pq_encode,
    pq_topk,
    pq_train,
    semdedup,
)
from lucene_spark.pipeline.dsir import (
    dsir_log_weights,
    dsir_resample,
)
from lucene_spark.pipeline.lm import (
    BigramLM,
    perplexity,
    train_bigram_lm,
)
from lucene_spark.pipeline.substrings import (
    duplicated_span_starts,
    duplicated_spans,
    ngram_spans,
    repeated_ngrams,
)
from lucene_spark.pipeline.textstats import (
    fingerprint_md5,
    language_id,
    quality_score,
    rolling_fingerprint,
    token_counts,
)

__all__ = [
    "BigramLM",
    "cosine_topk",
    "dsir_log_weights",
    "dsir_resample",
    "duplicated_spans",
    "perplexity",
    "train_bigram_lm",
    "hash_sample",
    "pack_sequences",
    "stratified_sample",
    "canonicalize_url",
    "registered_domain",
    "url_host",
    "embedding_near_dups",
    "exact_duplicates",
    "fingerprint_md5",
    "language_id",
    "lsh_bucket_topk",
    "lsh_signatures",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_score",
    "rolling_fingerprint",
    "simhash",
    "simhash_near_dups",
    "simhash_pairs_from_hashes",
    "token_counts",
    "word_shingles",
    "ngram_spans",
    "repeated_ngrams",
    "duplicated_span_starts",
    "ivf_assign",
    "ivf_topk",
    "ivf_pq_topk",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "semdedup",
    "sentence_windows",
    "compression_ratio",
    "domain_cap",
]
